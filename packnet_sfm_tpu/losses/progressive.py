"""Progressive scale-count schedule (reference losses/loss_base.py:9-48).

Host-side (static) computation: the trainer resolves the scale count *before*
tracing the step function, so the jitted graph always sees a static number of
scales — recompiles happen only at the few schedule boundaries.
"""

from __future__ import annotations

import bisect


def progressive_num_scales(progress: float, num_scales: int, progressive_scaling: float) -> int:
    """Scale count in effect at training ``progress`` in [0, 1].

    Reference semantics (loss_base.py:21-48): thresholds are
    ``[ps*(i+1) for i in range(n-1)] + [1.0]`` and the count is
    ``n - searchsorted(thresholds, progress)``; disabled when ps <= 0.
    """
    if progressive_scaling <= 0.0:
        return num_scales
    thresholds = [progressive_scaling * (i + 1) for i in range(num_scales - 1)] + [1.0]
    return int(num_scales - bisect.bisect_left(thresholds, progress))
