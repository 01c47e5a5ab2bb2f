"""DeviceDataset batching semantics: shuffled batches, drop-remainder, and
the fixed-shape padded iterator that keeps val_step at one compilation."""

import jax
import jax.numpy as jnp
import numpy as np

from bcnf_tpu.train.data import DeviceDataset, TrainerDataHandler


def _ds(n=70, d=3, c=4):
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n, d)).astype(np.float32)
    cond = rng.normal(size=(n, c)).astype(np.float32)
    return DeviceDataset(y, [cond]), y, cond


def test_batches_cover_dataset_shuffled():
    ds, y, _ = _ds()
    seen = []
    for by, _ in ds.batches(32, key=jax.random.key(0), drop_remainder=False):
        seen.append(np.asarray(by))
    cat = np.concatenate(seen)
    assert cat.shape == y.shape
    # same rows, different order
    assert not np.array_equal(cat, y)
    np.testing.assert_allclose(np.sort(cat, axis=0), np.sort(y, axis=0), rtol=1e-6)


def test_batches_drop_remainder():
    ds, _, _ = _ds(n=70)
    sizes = [b.shape[0] for b, _ in ds.batches(32, drop_remainder=True)]
    assert sizes == [32, 32]


def test_batches_padded_fixed_shape_and_weights():
    ds, y, cond = _ds(n=70)
    batches = list(ds.batches_padded(32))
    assert len(batches) == 3
    for by, bc, bw in batches:
        assert by.shape == (32, 3)          # every batch the same static shape
        assert bc[0].shape == (32, 4)
        assert bw.shape == (32,)
    # total weight equals the true row count; weighted rows reproduce the data
    total_w = sum(float(jnp.sum(w)) for _, _, w in batches)
    assert total_w == 70
    rows = np.concatenate([np.asarray(by)[np.asarray(bw) > 0] for by, _, bw in batches])
    np.testing.assert_array_equal(rows, y)
    # pad rows wrap to the dataset start
    last_y, _, last_w = batches[-1]
    np.testing.assert_array_equal(np.asarray(last_y)[np.asarray(last_w) == 0], y[: 32 - 6])


def test_split_dataset_is_shuffled_and_exact():
    y = np.arange(100, dtype=np.float32)[:, None]
    c = np.arange(100, dtype=np.float32)[:, None]
    (y_tr, c_tr), (y_val, c_val) = TrainerDataHandler.split_dataset(y, [c], 0.2, seed=3)
    assert len(y_val) == 20 and len(y_tr) == 80
    # Q2 fix: shuffled (not a head/tail slice), disjoint, complete
    assert not np.array_equal(y_val.ravel(), np.arange(20))
    merged = np.sort(np.concatenate([y_tr, y_val]).ravel())
    np.testing.assert_array_equal(merged, np.arange(100))
    # y/conditions stay row-aligned
    np.testing.assert_array_equal(y_tr, c_tr[0])
