"""Distributed set ops vs python set truth."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.relational.setops import set_op


def _ds(vals, n_blocks):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"k": pa.array(np.asarray(vals, np.int64), pa.int64())})
    ).random_shuffle(seed=2).repartition(n_blocks)


@pytest.mark.parametrize("op,fn", [
    ("union", lambda a, b: a | b),
    ("intersect", lambda a, b: a & b),
    ("except", lambda a, b: a - b),
])
def test_setops_match_python_sets(ray_session, op, fn):
    rng = np.random.default_rng(4)
    a = rng.integers(0, 300, 2000)
    b = rng.integers(100, 400, 1500)
    got = set_op(_ds(a, 7), _ds(b, 5), "k", op).to_pandas()["k"]
    assert set(got) == fn(set(a.tolist()), set(b.tolist()))
    assert got.is_unique


def test_setops_rejects_unknown_op(ray_session):
    with pytest.raises(ValueError):
        set_op(_ds([1], 1), _ds([2], 1), "k", "xor")


def test_setops_string_keys_with_empty_blocks(ray_session):
    import ray.data as rd

    a = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b", "c", "c"], pa.string())})
    ).repartition(6)  # more blocks than rows -> empty blocks exist
    b = rd.from_arrow(
        pa.table({"k": pa.array(["b", "d"], pa.string())})
    ).repartition(3)
    got = set_op(a, b, "k", "intersect").to_pandas()["k"]
    assert set(got) == {"b"}
