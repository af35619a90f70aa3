"""Small generic helpers (capability parity: reference utils/misc.py, utils/types.py)."""

from __future__ import annotations

from typing import Any, Sequence


def make_list(x: Any, n: int | None = None) -> list:
    """Wrap ``x`` in a list and optionally broadcast it to length ``n``.

    Mirrors the semantics of reference utils/misc.py:27 (``make_list``): lists
    or tuples pass through (with a length check when ``n`` is given); scalars
    are replicated ``n`` times.
    """
    if isinstance(x, (list, tuple)):
        x = list(x)
        if n is not None and len(x) == 1:
            return x * n
        if n is not None and len(x) != n:
            raise ValueError(f"list length {len(x)} != requested {n}")
        return x
    return [x] * (n if n is not None else 1)


def filter_dict(d: dict, keys: Sequence[str]) -> list:
    """Return the subset of ``keys`` present in ``d`` (reference utils/misc.py:7)."""
    return [k for k in keys if k in d]


def same_shape(a: Sequence[int], b: Sequence[int]) -> bool:
    """True if two shape tuples match (reference utils/misc.py:52)."""
    return len(a) == len(b) and all(x == y for x, y in zip(a, b))


def parse_crop_borders(borders: Sequence, shape: Sequence[int]) -> tuple:
    """Resolve crop borders into absolute pixel coords ``(x1, y1, x2, y2)``.

    Capability parity with reference utils/misc.py:77 (``parse_crop_borders``):
    - empty -> full image
    - len 2 -> (w, h) centered crop; floats are relative, negatives subtract
    - len 4 -> (x1, y1, x2, y2); floats relative, non-positive values wrap
      from the far edge.
    ``shape`` is (H, W).
    """
    h, w = shape[-2], shape[-1]
    if len(borders) == 0:
        return (0, 0, w, h)

    def _abs(v, size):
        return int(v * size) if isinstance(v, float) else int(v)

    if len(borders) == 2:
        cw, ch = _abs(borders[0], w), _abs(borders[1], h)
        if cw <= 0:
            cw += w
        if ch <= 0:
            ch += h
        x1, y1 = (w - cw) // 2, (h - ch) // 2
        return (x1, y1, x1 + cw, y1 + ch)
    if len(borders) == 4:
        x1, y1, x2, y2 = (_abs(borders[0], w), _abs(borders[1], h),
                          _abs(borders[2], w), _abs(borders[3], h))
        if x2 <= 0:
            x2 += w
        if y2 <= 0:
            y2 += h
        return (x1, y1, x2, y2)
    raise ValueError(f"Invalid crop borders {borders}")
