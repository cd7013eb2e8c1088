"""Style registries — the analogue of the LAMMPS plugin registration protocol.

The reference registers styles through `lammpsplugin_init` callbacks filling
a lammpsplugin_t (USER-AEAM/aeamplugin.cpp:14-28, creator.v1/v2 factories).
Here styles self-register by name at import time via decorators, and scenes
instantiate them LAMMPS-style from the input DSL (`pair_style rebomos`,
`fix 1 all nve`).
"""

from __future__ import annotations

from typing import Callable, Dict

PAIR_STYLES: Dict[str, Callable] = {}
FIX_STYLES: Dict[str, Callable] = {}


def register_pair_style(name: str):
    def deco(cls):
        PAIR_STYLES[name] = cls
        cls.name = name
        return cls
    return deco


def register_fix_style(name: str):
    def deco(cls):
        FIX_STYLES[name] = cls
        cls.name = name
        return cls
    return deco


def create_pair_style(name: str, *args, **kw):
    if name not in PAIR_STYLES:
        raise ValueError(f"Unknown pair style {name!r}; "
                         f"registered: {sorted(PAIR_STYLES)}")
    return PAIR_STYLES[name](*args, **kw)


def create_fix_style(name: str, *args, **kw):
    if name not in FIX_STYLES:
        raise ValueError(f"Unknown fix style {name!r}; "
                         f"registered: {sorted(FIX_STYLES)}")
    return FIX_STYLES[name](*args, **kw)
