"""Two-level 2-D Haar wavelet subband energies, exact integers.

The unnormalized Haar lifting (sum / difference, no 1/2 scaling) keeps
every coefficient an integer, so subband ENERGIES (sums of squared
coefficients) are exact int64 and SQL-replayable: per 2x2 block

    ll =  p00 + p01 + p10 + p11      (approximation)
    lh = (p00 + p10) - (p01 + p11)   (horizontal detail)
    hl = (p00 + p01) - (p10 + p11)   (vertical detail)
    hh =  p00 - p01 - p10 + p11      (diagonal detail)

and level 2 repeats the transform on the level-1 ``ll`` plane.  The
energy profile is the standard compressibility / texture statistic
(Mallat 1989); per-image map, nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rasters_ray import codec

__all__ = ["haar_level", "haar_energies", "haar_images"]


def haar_level(z: np.ndarray):
    """One unnormalized Haar level -> (ll, lh, hl, hh) int64 planes.
    Odd trailing rows/cols are cropped (dyadic convention)."""
    z = np.asarray(z, dtype=np.int64)
    h, w = (z.shape[0] // 2) * 2, (z.shape[1] // 2) * 2
    z = z[:h, :w]
    p00, p01 = z[0::2, 0::2], z[0::2, 1::2]
    p10, p11 = z[1::2, 0::2], z[1::2, 1::2]
    return (
        p00 + p01 + p10 + p11,
        (p00 + p10) - (p01 + p11),
        (p00 + p01) - (p10 + p11),
        p00 - p01 - p10 + p11,
    )


def haar_energies(arr: np.ndarray, levels: int = 2):
    """(level, subband, energy) rows: detail energies per level plus
    the final approximation energy."""
    z = np.rint(np.asarray(arr)).astype(np.int64)
    out = []
    for lv in range(1, levels + 1):
        z, lh, hl, hh = haar_level(z)
        out.append((lv, "lh", int((lh * lh).sum())))
        out.append((lv, "hl", int((hl * hl).sum())))
        out.append((lv, "hh", int((hh * hh).sum())))
    out.append((levels, "ll", int((z * z).sum())))
    return out


def haar_images(images_ds, levels: int = 2, transform=None):
    """Haar subband energies per image -> Dataset[(image_id, level,
    subband, energy)]."""

    def run(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "level", "subband", "energy")}
        for i in range(t.num_rows):
            px = codec.decode(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py())
            px = np.rint(px).astype(np.int64)
            if transform is not None:
                px = transform(px)
            for lv, sb, e in haar_energies(px, levels):
                out["image_id"].append(t.column("image_id")[i].as_py())
                out["level"].append(lv)
                out["subband"].append(sb)
                out["energy"].append(e)
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "level": pa.array(out["level"], pa.int64()),
                "subband": pa.array(out["subband"], pa.string()),
                "energy": pa.array(out["energy"], pa.int64()),
            }
        )

    return images_ds.map_batches(run, batch_format="pyarrow")
