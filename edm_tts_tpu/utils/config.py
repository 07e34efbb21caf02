"""YAML -> dataclass config parsing.

One structured config layer covering the reference's three tiers
(SURVEY.md §5: HfArgumentParser YAML for training, PretrainedConfig JSON for
models, launcher YAMLs). Training YAMLs keep the reference field names so
existing configs carry over; unknown fields are ignored with a warning.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Type, TypeVar

import yaml

logger = logging.getLogger("edm_tts_tpu")

T = TypeVar("T")


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def dataclass_from_dict(cls: Type[T], d: dict, warn_unknown: bool = False) -> T:
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names}
    if warn_unknown:
        for k in d:
            if k not in names:
                logger.debug("ignoring unknown config field %r for %s", k, cls.__name__)
    for f in dataclasses.fields(cls):
        if f.name in known and isinstance(known[f.name], list):
            # dataclasses in this codebase use tuples for static hashability
            if str(f.type).startswith(("Tuple", "tuple", "typing.Tuple")):
                known[f.name] = tuple(known[f.name])
    return cls(**known)


def parse_config_groups(path: str, **groups: Type) -> dict:
    """Parse one YAML into several dataclass groups.

    ``groups`` maps name -> dataclass; fields are pulled from the flat YAML
    top level (matching the reference's HfArgumentParser multi-dataclass
    parse of a single file, run_codec_training.py:184-197).
    """
    raw = load_yaml(path)
    return {name: dataclass_from_dict(cls, raw) for name, cls in groups.items()}
