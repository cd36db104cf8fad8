"""Small generic containers/transposes (tu/configs.py parity: AttrDict,
list_of_dicts__to__dict_of_lists and inverse)."""
from __future__ import annotations

from typing import Any, Dict, List


class AttrDict(dict):
    """dict with attribute access (tu/configs.py AttrDict)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def list_of_dicts__to__dict_of_lists(lst: List[Dict]) -> Dict[str, List]:
    """tu/configs.py:164."""
    if not lst:
        return {}
    keys = lst[0].keys()
    assert all(d.keys() == keys for d in lst), "inconsistent keys"
    return {k: [d[k] for d in lst] for k in keys}


def dict_of_lists__to__list_of_dicts(dct: Dict[str, List]) -> List[Dict]:
    if not dct:
        return []
    n = len(next(iter(dct.values())))
    assert all(len(v) == n for v in dct.values()), "inconsistent lengths"
    return [{k: dct[k][i] for k in dct} for i in range(n)]
