"""Model hyperparameters.

Names and defaults mirror the reference binding
(/root/reference/outliertree/__init__.py:143-207); the semantics of each
knob are documented there.  ``max_fit_rows`` is ours: the constraint-fit
runs on a bounded deterministic sample (the reference fits in-memory on a
single node; at 10^12-row scale the fit sample is capped and the *validate*
path is the part that scales out).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass


@dataclass
class ValidationConfig:
    max_depth: int = 4
    min_gain: float = 1e-2
    z_norm: float = 2.67
    z_outlier: float = 8.0
    pct_outliers: float = 0.01
    min_size_numeric: int = 25
    min_size_categ: int = 50
    categ_split: str = "binarize"      # binarize | bruteforce | separate
    categ_outliers: str = "tail"       # tail | majority
    numeric_split: str = "raw"         # raw | mid
    follow_all: bool = False
    gain_as_pct: bool = True
    # Spark-side knobs (not in the reference)
    max_fit_rows: int = 1_000_000      # cap on driver-side fit sample
    seed: int = 42

    def __post_init__(self) -> None:
        assert self.max_depth >= 0
        assert self.z_norm > 0
        assert self.z_outlier > self.z_norm
        assert 0 < self.pct_outliers < 0.1
        assert self.min_size_numeric >= 10
        assert self.min_size_categ >= 10
        assert self.categ_split in ("binarize", "bruteforce", "separate")
        assert self.categ_outliers in ("tail", "majority")
        assert self.numeric_split in ("mid", "raw")

    @property
    def z_tail(self) -> float:
        return self.z_outlier - self.z_norm

    @property
    def take_mid(self) -> bool:
        return self.numeric_split == "mid"

    @property
    def categ_as_bin(self) -> bool:
        return self.categ_split == "binarize"

    @property
    def ord_as_bin(self) -> bool:
        return self.categ_split == "binarize"

    @property
    def cat_bruteforce_subset(self) -> bool:
        return self.categ_split == "bruteforce"

    @property
    def categ_from_maj(self) -> bool:
        return self.categ_outliers == "majority"

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ValidationConfig":
        return cls(**d)


SD_REG = 1e-5  # SD regularizer (reference: src/outlier_tree.hpp:649)
