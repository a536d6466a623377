"""Physics scalar functions (SURVEY §2.4) as pure column expressions.

Everything here is JVM-side whole-stage-codegen'd arithmetic — no UDFs.
The reference implements these with astropy / NumPy row loops:

  * direction cosines      — ``to_XY_astropy``,
    ``create_train_valid_test_datasets.py:96-101`` (applied 134-139)
  * spherical round-trip    — ``to_R_astropy``,
    ``create_train_valid_test_datasets.py:104-110``
  * azimuth rotation wrap   — ``create_train_valid_test_datasets.py:63-67``
  * core sign flips         — ``create_train_valid_test_datasets.py:59-62``
  * log1p energy-deposit    — ``train_classification.py:185``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def direction_cosines(ze: Column, az: Column) -> tuple[Column, Column, Column]:
    """Unit direction vector from zenith/azimuth in degrees.

    Matches the astropy convention in the reference (its "latitude" is
    90° − zenith): dir_z = cos(ze), dir_x = sin(ze)·cos(az),
    dir_y = sin(ze)·sin(az).
    """
    ze_r, az_r = F.radians(ze), F.radians(az)
    return (
        F.sin(ze_r) * F.cos(az_r),
        F.sin(ze_r) * F.sin(az_r),
        F.cos(ze_r),
    )


def cartesian_to_spherical(x: Column, y: Column, z: Column | None = None) -> tuple[Column, Column]:
    """Inverse of :func:`direction_cosines`; z defaults to the unit-norm
    completion ``sqrt(1 − x² − y²)`` like the reference's ``to_R_astropy``.
    Returns (ze_deg, az_deg) with azimuth wrapped to [0, 360)."""
    if z is None:
        z = F.sqrt(F.lit(1.0) - x * x - y * y)
    ze = F.degrees(F.acos(z))
    # Azimuth is undefined at the pole (x = y = 0); pin it to 0 so the
    # result doesn't depend on IEEE signed-zero atan2 edge cases.
    az = F.when((x == 0) & (y == 0), F.lit(0.0)).otherwise(
        F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))
    )
    return ze, az


def rotate_azimuth(az: Column, k: int) -> Column:
    """Azimuth after k 90° grid rotations, wrapped to [0, 360)."""
    return F.pmod(az + F.lit(90.0 * (k % 4)), F.lit(360.0))


def rotate_core(x: Column, y: Column, k: int) -> tuple[Column, Column]:
    """Shower-core sign flips under k 90° rotations (plan-time constant
    k folds to plain negation — no branch survives codegen)."""
    k = k % 4
    new_x = -x if k in (1, 2) else x
    new_y = -y if k in (2, 3) else y
    return new_x, new_y


def rotate_grid_index(ix: Column, iy: Column, k: int, n: int = 16) -> tuple[Column, Column]:
    """np.rot90(axes=(1,2)) on long-form grid coordinates: pure
    projection, zero data movement. k=1: (ix,iy) → (n−1−iy, ix)."""
    k = k % 4
    if k == 0:
        return ix, iy
    if k == 1:
        return (F.lit(n - 1) - iy).cast("int"), ix.cast("int")
    if k == 2:
        return (F.lit(n - 1) - ix).cast("int"), (F.lit(n - 1) - iy).cast("int")
    return iy.cast("int"), (F.lit(n - 1) - ix).cast("int")


def log1p_edep(edep: Column) -> Column:
    """log(1 + energy-deposit) channel transform."""
    return F.log1p(edep)


def standardize(x: Column, mean: Column, std: Column) -> Column:
    """(x − μ)/σ — StandardScaler application."""
    return (x - mean) / std


def minmax_scale(x: Column, lo: Column, hi: Column) -> Column:
    """(x − min)/(max − min) — MinMaxScaler application."""
    return (x - lo) / (hi - lo)
