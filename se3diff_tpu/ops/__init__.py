"""Core math ops: SO(3) algebra, IGSO(3) numerics, lookup tables."""

from se3diff_tpu.ops import igso3, so3, tables  # noqa: F401
