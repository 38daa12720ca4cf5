"""Alignment configuration.

The reference hardcodes gap penalties in its CLIs (go=10, ge=0.5;
rust/sequence_alignment/src/main.rs:34) while its engines accept any values;
we expose them in one dataclass together with TPU-side execution knobs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

# Alignment modes (semantics parity: sequence_alignment.rs:11-13)
GLOBAL = 0  # EMBOSS `needle -endweight Y`
GLOCAL = 1  # EMBOSS `needle` (end gaps free)
LOCAL = 2   # EMBOSS `water`

MODE_NAMES = {GLOBAL: "global", GLOCAL: "glocal", LOCAL: "local"}
MODE_MESSAGES = {
    GLOBAL: "Global alignment",
    GLOCAL: "Glocal alignment",
    LOCAL: "Local alignment",
}

# Traceback state codes (parity: sequence_alignment.rs:7-9)
CELL_MATCH = 0
CELL_GAPINX = 1  # gap in seq1 (consumes seq2 / j axis)
CELL_GAPINY = 2  # gap in seq2 (consumes seq1 / i axis)
# Local-mode "score is zero here, stop traceback" marker (2-bit packed).
CELL_STOP = 3

# Default padded-length ladder for shape bucketing (median reference test
# length is ~438, max 3685; cf. SURVEY.md §6).
DEFAULT_BUCKETS: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


@dataclass(frozen=True)
class AlignConfig:
    mode: int = LOCAL
    gap_open: float = 10.0   # stored positive, negated internally
    gap_extend: float = 0.5
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS

    def __post_init__(self):
        # The engines' vectorized recurrences (max-plus cummax for the X
        # state, boundary closed forms) are bit-exact vs the reference's
        # sequential recurrence only when every partial sum is exactly
        # representable in f32 — guaranteed for quarter-integer penalties
        # (all reference CLIs use go=10, ge=0.5).  Arbitrary floats (e.g.
        # 0.1) can diverge in the last ulp and flip equality-sensitive
        # tie-breaks, changing alignment strings.
        import warnings

        for name, v in (("gap_open", self.gap_open), ("gap_extend", self.gap_extend)):
            if (abs(v) * 4.0) != round(abs(v) * 4.0):
                warnings.warn(
                    f"{name}={v} is not a multiple of 0.25: scores may differ "
                    "from a sequential implementation in the last ulp and "
                    "tie-breaks (hence alignment strings) may diverge",
                    stacklevel=2,
                )

    @property
    def og(self) -> float:
        return -abs(self.gap_open)

    @property
    def eg(self) -> float:
        return -abs(self.gap_extend)

    @property
    def mode_name(self) -> str:
        return MODE_NAMES[self.mode]


def bucket_len(n: int, buckets: Tuple[int, ...] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n (last bucket is a hard cap -> rounded up to a
    multiple of 256 beyond the ladder)."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 256) * 256
