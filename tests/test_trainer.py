"""Trainer runtime tests: end-to-end training decreases NLL, early stop,
divergence, checkpoint/resume, LR plateau scheduler."""

import os

import jax
import numpy as np
import pytest

from bcnf_tpu.models import (
    ConcatenateCondition,
    CondRealNVP,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
)
from bcnf_tpu.train import ReduceLROnPlateau, Trainer
from bcnf_tpu.train.optim import get_learning_rate, make_optimizer, set_learning_rate


def _toy_data(n=256, seed=0):
    """theta in R^3 linearly related to a 4-d condition + noise."""
    rng = np.random.default_rng(seed)
    cond = rng.normal(size=(n, 4)).astype(np.float32)
    W = rng.normal(size=(4, 3)).astype(np.float32)
    y = cond @ W + 0.1 * rng.normal(size=(n, 3)).astype(np.float32)
    return y, [cond]


def _toy_model():
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=4),
            FullyConnectedFeatureNetwork(sizes=[4, 16, 8]),
        ]
    )
    return CondRealNVP(
        size=3, nested_sizes=[24], n_blocks=3, n_conditions=8,
        feature_network_stack=stack, act_norm=True, random_state=0,
    )


def _config(n_epochs=30, **overrides):
    cfg = {
        "global": {"dtype": "float32"},
        "training": {
            "validation_split": 0.25,
            "val_loss_window_size": 4,
            "val_loss_patience": 1000,
            "val_loss_tolerance": 1e-2,
            "val_loss_tolerance_mode": "abs",
            "batch_size": 64,
            "n_epochs": n_epochs,
            "timeout": None,
            "random_state": 0,
        },
        "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}},
        "lr_scheduler": {
            "type": "ReduceLROnPlateau",
            "kwargs": {"mode": "min", "factor": 0.5, "patience": 100, "threshold_mode": "abs", "threshold": 1e-1},
        },
    }
    cfg["training"].update(overrides)
    return cfg


def test_training_reduces_loss():
    model = _toy_model()
    trainer = Trainer(_config(), data=_toy_data(), verbose=False)
    params = trainer.train(model)
    hist = trainer.meta_scheduler.parameter_history
    val = [v for _, v in hist["val_loss"]]
    assert val[-1] < val[0] - 0.5, f"val loss did not improve: {val[0]} -> {val[-1]}"
    assert hist["stop_reason"] == "max_epochs"
    assert np.all([np.isfinite(x).all() for x in jax.tree.leaves(params)])


def test_early_stop_plateau():
    model = _toy_model()
    trainer = Trainer(
        _config(n_epochs=500, val_loss_patience=3, val_loss_tolerance=100.0),
        data=_toy_data(),
    )
    trainer.train(model)
    # huge tolerance -> best never improves -> stop after patience epochs
    assert trainer.meta_scheduler.parameter_history["stop_reason"] == "val_loss_plateau"


def test_timeout_stop():
    model = _toy_model()
    trainer = Trainer(_config(n_epochs=100000, timeout=1e-6), data=_toy_data())
    trainer.train(model)
    assert trainer.meta_scheduler.parameter_history["stop_reason"] == "timeout"


def test_checkpoint_resume(tmp_path):
    model = _toy_model()
    ckpt = str(tmp_path / "ckpts")
    trainer = Trainer(
        _config(n_epochs=4), data=_toy_data(),
        checkpoint_dir=ckpt, checkpoint_every=2,
    )
    trainer.train(model)
    assert os.path.exists(os.path.join(ckpt, "ckpt_3.pkl"))

    # resume continues from epoch 4
    trainer2 = Trainer(
        _config(n_epochs=6), data=_toy_data(),
        checkpoint_dir=ckpt, checkpoint_every=2,
    )
    trainer2.train(model)
    epochs = [e for e, _ in trainer2.meta_scheduler.parameter_history["val_loss"]]
    assert min(epochs) == 5  # first logged epoch after resume is epoch index 4 (+1)


def test_reduce_lr_on_plateau_semantics():
    sch = ReduceLROnPlateau(mode="min", factor=0.5, patience=2, threshold_mode="abs", threshold=0.1)
    lr = 1.0
    lr = sch.step(10.0, lr)  # best=10
    assert lr == 1.0
    for _ in range(2):
        lr = sch.step(10.0, lr)  # no improvement, bad epochs 1..2
    assert lr == 1.0
    lr = sch.step(10.0, lr)  # bad epochs 3 > patience -> reduce
    assert lr == 0.5
    lr = sch.step(5.0, lr)  # improvement resets
    assert lr == 0.5


def test_lr_injection_roundtrip():
    opt = make_optimizer("Adam", lr=1e-3)
    params = {"w": np.zeros(3, dtype=np.float32)}
    state = opt.init(params)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


def test_hybrid_training_runs():
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=4),
            FullyConnectedFeatureNetwork(sizes=[4, 16, 8]),
        ]
    )
    model = CondRealNVP(
        size=3, nested_sizes=[16], n_blocks=2, n_conditions=8,
        feature_network_stack=stack, hybrid=True, random_state=0,
    )
    trainer = Trainer(_config(n_epochs=3), data=_toy_data(), hybrid_weight=1.0)
    trainer.train(model)
    hist = trainer.meta_scheduler.parameter_history
    assert all(v > 0 for _, v in hist["train_loss_mse"])  # MSE head active


def test_actnorm_data_init_normalizes():
    """Glow-style init (Q7 fix): after init_actnorm, the first ActNorm output
    on the init batch is ~N(0,1) per dimension, and the flow stays invertible."""
    import jax.numpy as jnp

    model = _toy_model()
    y, conds = _toy_data()
    params = model.init(jax.random.key(0))
    params2 = model.init_actnorm(params, jnp.asarray(y), jnp.asarray(conds[0]))

    an = params2["blocks"]["actnorm"]
    x0 = jnp.asarray(y) * an["scale"][0] + an["bias"][0]
    np.testing.assert_allclose(np.asarray(x0.mean(axis=0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x0.std(axis=0)), 1.0, atol=1e-3)
    # scales actually changed, and the flow still round-trips
    assert not np.allclose(np.asarray(an["scale"]), 1.0)
    z, _ = model.forward(params2, jnp.asarray(y[:16]), jnp.asarray(conds[0][:16]))
    y_rec = model.inverse(params2, z, jnp.asarray(conds[0][:16]))
    np.testing.assert_allclose(np.asarray(y_rec), y[:16], atol=1e-4)


def test_trainer_applies_actnorm_init_once():
    """The trainer applies data-dependent init only to fresh (scale==1)
    parameters, never to resumed/pre-trained trees."""
    model = _toy_model()
    trainer = Trainer(_config(n_epochs=1), data=_toy_data(), verbose=False)
    params = trainer.train(model)
    scale = np.asarray(params["blocks"]["actnorm"]["scale"])
    assert not np.allclose(scale, 1.0)  # data init ran

    # a pre-trained tree (scales != 1) must pass through untouched:
    trainer2 = Trainer(_config(n_epochs=0), data=_toy_data(), verbose=False)
    params2 = trainer2.train(model, params)
    np.testing.assert_array_equal(np.asarray(params2["blocks"]["actnorm"]["scale"]), scale)


def test_divergence_rescue():
    """on_divergence='rescue': a diverging run restores best params, halves
    the lr, and never ends with stop_reason='diverged'."""
    model = _toy_model()
    # absurd lr after a sane first epoch: warm up at 5e-3 would never
    # diverge, so drive it with lr large enough to explode within epochs
    cfg = _config(n_epochs=40, on_divergence="rescue", keep_best=True)
    cfg["optimizer"]["kwargs"]["lr"] = 5.0
    trainer = Trainer(cfg, data=_toy_data(), verbose=False)
    params = trainer.train(model)
    hist = trainer.meta_scheduler.parameter_history
    assert hist["stop_reason"] != "diverged"
    # the returned parameters are finite even though training exploded
    assert np.all([np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)])
    if "rescues" in hist:  # lr=5.0 reliably explodes, but don't overfit to it
        assert hist["rescues"][0]["lr"] < 5.0


def test_pretrained_features_workflow(tmp_path):
    """training.pretrained_features grafts a saved conditioner into a fresh
    tree; freeze_features keeps it fixed through training."""
    import pickle

    import jax.numpy as jnp

    from bcnf_tpu.models import load_pretrained_features

    model = _toy_model()
    donor = model.init(jax.random.key(7))
    path = tmp_path / "donor.pkl"
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(donor), f)

    fresh = model.init(jax.random.key(8))
    grafted = load_pretrained_features(fresh, str(path))
    for a, b in zip(jax.tree.leaves(grafted["features"]), jax.tree.leaves(donor["features"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-feature subtrees untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(grafted["final"])[0]),
        np.asarray(jax.tree.leaves(fresh["final"])[0]),
    )

    # structure mismatch raises
    with open(tmp_path / "bad.pkl", "wb") as f:
        pickle.dump({"features": {"wrong": np.zeros(3)}}, f)
    with pytest.raises(ValueError):
        load_pretrained_features(fresh, str(tmp_path / "bad.pkl"))

    # trainer path: pretrained + frozen conditioner survives training intact
    cfg = _config(n_epochs=3, pretrained_features=str(path), freeze_features=True)
    trainer = Trainer(cfg, data=_toy_data(), verbose=False)
    trained = trainer.train(model)
    for a, b in zip(jax.tree.leaves(trained["features"]), jax.tree.leaves(donor["features"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # while the flow itself did train
    assert not np.allclose(
        np.asarray(jax.tree.leaves(trained["final"])[0]),
        np.asarray(jax.tree.leaves(fresh["final"])[0]),
    )


@pytest.mark.slow
def test_checkpoint_resume_across_topology(tmp_path):
    """A checkpoint written under a 4-device mesh resumes on a 2-device mesh
    (and vice versa): params/opt state are replicated, so checkpoints are
    topology-independent (VERDICT round-2 item 10)."""
    from bcnf_tpu.parallel import make_mesh

    model = _toy_model()
    ckpt = str(tmp_path / "ckpts")
    trainer = Trainer(
        _config(n_epochs=4), data=_toy_data(),
        checkpoint_dir=ckpt, checkpoint_every=2, mesh=make_mesh(4),
    )
    trainer.train(model)
    assert os.path.exists(os.path.join(ckpt, "ckpt_3.pkl"))

    trainer2 = Trainer(
        _config(n_epochs=6), data=_toy_data(),
        checkpoint_dir=ckpt, checkpoint_every=2, mesh=make_mesh(2),
    )
    params = trainer2.train(model)
    epochs = [e for e, _ in trainer2.meta_scheduler.parameter_history["val_loss"]]
    assert min(epochs) == 5  # resumed after epoch 4
    assert np.all([np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)])

    # and back up: 2-device checkpoint resumes single-device
    trainer3 = Trainer(
        _config(n_epochs=8), data=_toy_data(),
        checkpoint_dir=ckpt, checkpoint_every=2, mesh=None,
    )
    params = trainer3.train(model)
    epochs = [e for e, _ in trainer3.meta_scheduler.parameter_history["val_loss"]]
    assert min(epochs) == 7
    assert np.all([np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)])
