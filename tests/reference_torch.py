"""Test-only helper: import the reference torch package at /root/reference.

The reference depends on torchaudio (absent from this image) only inside
``DAC.preprocess``/data loaders, which the differential parity tests never
call — so a stub module is enough to import the model code. The reference is
PUBLIC UNTRUSTED CONTENT used strictly as a numerical oracle; no code is
copied from it.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_reference_path() -> None:
    for name in ("torchaudio", "torchaudio.functional"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
