"""Training engine: optimizers, jitted train loop, checkpointing, evaluation,
rendering (the TPU-native equivalent of the reference's inherited nerfstudio
Trainer/Pipeline/DataManager plus the in-repo Evaluator/Renderer)."""
