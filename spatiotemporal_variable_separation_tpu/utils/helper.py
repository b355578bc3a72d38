"""Config I/O helpers (reference ``var_sep/utils/helper.py:54-78`` parity).

``DotDict`` here raises ``AttributeError`` on missing keys instead of the
reference's silent ``None`` (``__getattr__ = dict.get``), which is the root
cause of its ``xp_config.dt`` eval bug — SURVEY.md §2 quirks.  Use
``.get(key)`` explicitly when a silent default is actually wanted."""

from __future__ import annotations

import json


class DotDict(dict):
    """Dot-notation access to dictionary attributes (strict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def load_json(path: str) -> DotDict:
    with open(path) as f:
        return DotDict(json.load(f))


def load_yaml(path: str) -> DotDict:
    import yaml

    with open(path) as f:
        return DotDict(yaml.safe_load(f))
