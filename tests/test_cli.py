"""CLI parsing regression tests (utils/cli.py — the tyro stand-in).

Round-3 verdict bug: a bare ``tuple`` annotation fell through to the untyped
single-string branch, so ``--modalities thermal`` yielded the *string*
``'thermal'`` and render_video iterated its characters.
"""

import dataclasses
import enum
from pathlib import Path
from typing import Optional

from thermo_tpu.utils.cli import parse_cli


class Color(enum.Enum):
    RED = "red"
    BLUE = "blue"


@dataclasses.dataclass
class Params:
    name: str = "exp"
    count: int = 3
    rate: float = 0.5
    flag: bool = False
    out: Optional[Path] = None
    modalities: tuple = ("img", "thermal")
    sizes: "tuple[int, ...]" = (1, 2)
    tags: "list[str]" = dataclasses.field(default_factory=lambda: ["a"])
    color: Color = Color.RED


class TestSequenceFlags:
    def test_bare_tuple_single_value(self):
        p = parse_cli(Params, ["--modalities", "thermal"])
        assert p.modalities == ("thermal",)

    def test_bare_tuple_multi_value(self):
        p = parse_cli(Params, ["--modalities", "thermal", "depth"])
        assert p.modalities == ("thermal", "depth")

    def test_bare_tuple_default_preserved(self):
        p = parse_cli(Params, [])
        assert p.modalities == ("img", "thermal")

    def test_typed_tuple_elements_coerced(self):
        p = parse_cli(Params, ["--sizes", "7", "9"])
        assert p.sizes == (7, 9)

    def test_list_flag(self):
        p = parse_cli(Params, ["--tags", "x", "y"])
        assert p.tags == ["x", "y"]

    def test_render_parameters_modalities(self):
        """The exact failing call from the round-3 verdict."""
        from thermo_tpu.modalities import RenderedImageModality
        from thermo_tpu.scripts.render_video import RenderParameters

        p = parse_cli(
            RenderParameters,
            ["--model-path", "/tmp/x", "--camera-path", "/tmp/c.json",
             "--output-dir", "/tmp/o", "--modalities", "thermal"],
        )
        assert p.modalities == ("thermal",)
        assert [RenderedImageModality(m) for m in p.modalities] == [
            RenderedImageModality.THERMAL
        ]


class TestScalarFlags:
    def test_defaults_roundtrip(self):
        p = parse_cli(Params, [])
        assert p == Params()

    def test_scalars(self):
        p = parse_cli(
            Params, ["--name", "x", "--count", "9", "--rate", "1.5", "--flag"]
        )
        assert (p.name, p.count, p.rate, p.flag) == ("x", 9, 1.5, True)

    def test_no_flag(self):
        assert parse_cli(Params, ["--no-flag"]).flag is False

    def test_enum(self):
        assert parse_cli(Params, ["--color", "blue"]).color is Color.BLUE

    def test_path(self):
        assert parse_cli(Params, ["--out", "/tmp/z"]).out == Path("/tmp/z")
