"""Dataclass -> argparse CLI.

Minimal stand-in for ``tyro`` (which every reference script uses,
e.g. train_eval_script.py:82, but which is not available in this
environment): flags are derived from dataclass fields
(``--field-name``, underscores become dashes), with bool fields as
``--flag/--no-flag`` pairs, Optional/Path/enum/int/float/str support, and
dataclass defaults preserved.
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import typing
from pathlib import Path
from typing import Optional, Type, TypeVar

T = TypeVar("T")


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def _add_field(parser: argparse.ArgumentParser, f: dataclasses.Field) -> None:
    name = "--" + f.name.replace("_", "-")
    tp, optional = _unwrap_optional(f.type)
    if isinstance(tp, str):  # from __future__ annotations
        tp = {"str": str, "int": int, "float": float, "bool": bool, "Path": Path}.get(
            tp.replace("typing.Optional[", "").rstrip("]"), str
        )
    default = (
        f.default
        if f.default is not dataclasses.MISSING
        else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
    )
    help_text = f"(default: {default})"
    if tp is bool:
        group = parser.add_mutually_exclusive_group()
        group.add_argument(name, dest=f.name, action="store_true", help=help_text)
        group.add_argument(
            "--no-" + f.name.replace("_", "-"), dest=f.name, action="store_false"
        )
        parser.set_defaults(**{f.name: default})
    elif isinstance(tp, type) and issubclass(tp, enum.Enum):
        parser.add_argument(
            name, dest=f.name, default=default,
            type=lambda s, tp=tp: tp(s),
            choices=list(tp), help=help_text,
        )
    elif tp is Path:
        parser.add_argument(
            name, dest=f.name, default=default,
            type=lambda s: Path(s) if s is not None else None, help=help_text,
        )
    elif tp in (int, float, str):
        parser.add_argument(name, dest=f.name, default=default, type=tp, help=help_text)
    elif typing.get_origin(tp) in (list, tuple) or tp in (list, tuple):
        # typed (tuple[str, ...]) OR bare (``modalities: tuple``) sequence
        # annotations: multi-value flag. Bare annotations infer the element
        # type from the default's first element so ``--modalities thermal``
        # yields ("thermal",), not the string "thermal" (round-3 CLI bug:
        # bare tuple fell through to the untyped single-string branch and
        # render_video then iterated the string's characters).
        inner = (typing.get_args(tp) or (None,))[0]
        if inner in (None, Ellipsis):
            inner = type(default[0]) if isinstance(default, (list, tuple)) and default else str
        if isinstance(inner, type) and issubclass(inner, enum.Enum):
            elem_type = lambda s, tp=inner: tp(s)
        else:
            elem_type = inner
        seq = tuple if (tp is tuple or typing.get_origin(tp) is tuple) else list
        parser.add_argument(
            name, dest=f.name, default=default, type=elem_type, nargs="*",
            action=_seq_action(seq), help=help_text,
        )
    else:
        parser.add_argument(name, dest=f.name, default=default, help=help_text)


def _seq_action(seq: type):
    """argparse action coercing the collected values to ``seq`` (tuple/list)
    so dataclass fields annotated ``tuple`` get tuples back."""

    class _Seq(argparse.Action):
        def __call__(self, parser, namespace, values, option_string=None):
            setattr(namespace, self.dest, seq(values))

    return _Seq


def parse_cli(cls: Type[T], args=None, description: Optional[str] = None) -> T:
    """Parse CLI flags into an instance of dataclass ``cls``."""
    parser = argparse.ArgumentParser(
        description=description or (cls.__doc__ or "").strip().splitlines()[0]
        if cls.__doc__
        else None
    )
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if not f.init:
            continue
        f_typed = dataclasses.replace(f) if False else f
        f_typed.type = hints.get(f.name, f.type)
        _add_field(parser, f_typed)
    ns = parser.parse_args(args)
    return cls(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(cls) if f.init})
