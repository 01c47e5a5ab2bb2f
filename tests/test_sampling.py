"""Tests for prior sampling, camera rendering, and dataset generation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnf_tpu.simulation import camera, priors, sampling

PRIOR = {
    "x0": {
        "x0_xy": {"distribution": "gaussian", "mean": 0, "std": 20},
        "x0_z": {"distribution": "uniform", "min": 0.1, "max": 2.5},
    },
    "v0": {
        "v0_xy": {"distribution": "gaussian", "mean": 0, "std": 15},
        "v0_z": {"distribution": "gaussian", "mean": 7, "std": 5},
    },
    "w": {
        "w_xy": {"distribution": "gaussian", "mean": 0, "std": 3},
        "w_z": {"distribution": "gaussian", "mean": 0, "std": 1},
    },
    "a": {"distribution": "gaussian", "mean": 0, "std": 0},
    "g": {"distribution": "gamma", "shape": 9.81, "scale": 1},
    "rho": {"distribution": "gamma", "shape": 3.5, "scale": 0.35},
    "r_ball": {"distribution": "gamma", "shape": 1.75, "scale": 0.05},
    "Cd": {"distribution": "gamma", "shape": 2, "scale": 0.35},
    "m": {"distribution": "gamma", "shape": 2, "scale": 0.15},
    "cam_radian": {"distribution": "uniform", "min": 0, "max": 6.283185307},
    "cam_radius": {"distribution": "gamma", "shape": 2.5, "scale": 5},
    "cam_angle": {"distribution": "gamma", "shape": 3, "scale": 10},
    "cam_heights": {"distribution": "uniform", "min": 0.4, "max": 1.4},
}


def test_prior_shapes_and_derived_quantities():
    key = jax.random.key(0)
    p = priors.sample_ballistic_parameters(key, 256, PRIOR, num_cams=2)
    assert p["x0_x"].shape == (256,)
    assert p["cam_radian_array"].shape == (256, 1)
    assert p["cam_angles"].shape == (256, 2)
    # derived: b = rho * pi r^2 * Cd (reference sampling.py:234-239)
    np.testing.assert_allclose(
        np.asarray(p["b"]),
        np.asarray(p["rho"] * jnp.pi * p["r"] ** 2 * p["Cd"]),
        rtol=1e-5,
    )
    # gravity points down, horizontal components zero (reference :224,265-266)
    assert (np.asarray(p["g_z"]) < 0).all()
    assert (np.asarray(p["g_x"]) == 0).all()
    # a ~ N(mean=0, std=0) -> exactly zero thrust
    np.testing.assert_allclose(np.asarray(p["a_x"]), 0.0, atol=1e-6)


def test_prior_statistics():
    key = jax.random.key(1)
    p = priors.sample_ballistic_parameters(key, 20000, PRIOR, num_cams=2)
    # gamma(9.81, 1) has mean 9.81
    assert abs(-np.asarray(p["g_z"]).mean() - 9.81) < 0.15
    # x0_z ~ U(0.1, 2.5)
    x0z = np.asarray(p["x0_z"])
    assert 0.1 <= x0z.min() and x0z.max() <= 2.5
    assert abs(x0z.mean() - 1.3) < 0.05
    # polar angle symmetric: mean x0_x ~ 0
    assert abs(np.asarray(p["x0_x"]).mean()) < 0.5


def test_cams_position_zip_vs_legacy():
    rad = jnp.array([0.0, jnp.pi / 2])
    hgt = jnp.array([1.0, 2.0])
    fixed = camera.get_cams_position(rad, 25.0, hgt)
    np.testing.assert_allclose(np.asarray(fixed[0]), [-25, 0, 1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(fixed[1]), [0, 25, 2.0], atol=1e-5)
    # Legacy pairing (SURVEY.md Q6): cam1=(rad[0], rad[1]), cam2=(hgt[0], hgt[1])
    legacy = camera.get_cams_position(rad, 25.0, hgt, legacy_pairing=True)
    np.testing.assert_allclose(
        np.asarray(legacy[0]),
        [-25 * np.cos(0.0), 25 * np.sin(0.0), np.pi / 2],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(legacy[1]),
        [-25 * np.cos(1.0), 25 * np.sin(1.0), 2.0],
        atol=1e-5,
    )


def test_render_frame_mc_properties():
    key = jax.random.key(0)
    img = camera.render_frame_mc(
        key,
        jnp.array([0.0, 0.0, 1.5]),
        jnp.array([-25.0, 0.0, 1.5]),
        jnp.array(0.0),
        jnp.array(0.11),
    )
    img = np.asarray(img)
    assert img.shape == (90, 160)
    np.testing.assert_allclose(img.sum(), 1.0, rtol=1e-5)
    # ball dead-center -> mass near the image center
    cy, cx = np.unravel_index(img.argmax(), img.shape)
    assert abs(cy - 45) <= 2 and abs(cx - 80) <= 2


def test_render_frame_analytic_matches_mc_center_of_mass():
    key = jax.random.key(3)
    ball = jnp.array([3.0, 2.0, 4.0])
    cam = jnp.array([-20.0, 1.0, 1.0])
    mc = np.asarray(camera.render_frame_mc(key, ball, cam, jnp.array(5.0), jnp.array(0.2)))
    an = np.asarray(camera.render_frame_analytic(ball, cam, jnp.array(5.0), jnp.array(0.2)))
    assert an.shape == mc.shape
    np.testing.assert_allclose(an.sum(), 1.0, rtol=1e-5)
    ys, xs = np.mgrid[0:90, 0:160]
    for axis in (ys, xs):
        com_mc = (axis * mc).sum()
        com_an = (axis * an).sum()
        assert abs(com_mc - com_an) < 2.0


def test_render_out_of_view_is_zero():
    img = camera.render_frame_analytic(
        jnp.array([-50.0, 0.0, 1.5]),  # behind the camera
        jnp.array([-25.0, 0.0, 1.5]),
        jnp.array(0.0),
        jnp.array(0.11),
    )
    assert np.asarray(img).sum() == 0.0


@pytest.mark.parametrize("do_filter", [False, True])
def test_generate_data_trajectories(do_filter):
    data = sampling.generate_data(
        prior_config=PRIOR,
        n=8,
        output_type="trajectories",
        dt=1 / 15,
        T=1.0,
        do_filter=do_filter,
        seed=0,
        batch_size=16,
        renderer="analytic",
    )
    assert len(data["trajectories"]) == 8
    assert data["trajectories"][0].shape == (15, 3)
    assert "videos" not in data
    assert len(data["cam_radian_array"][0]) == 2  # cam1 radian prepended
    if do_filter:
        assert all(z >= 0 for z in data["x0_z"])


def test_generate_data_observation_noise():
    """observation_noise perturbs trajectories airborne-only with the given
    std (reference `src/bcnf/simulation/observation.py:4-10`) and leaves the
    rest of the dataset (parameters) untouched."""
    kwargs = dict(
        prior_config=PRIOR, n=8, output_type="trajectories",
        dt=1 / 15, T=1.0, do_filter=False, seed=3, batch_size=16,
    )
    clean = sampling.generate_data(**kwargs)
    noisy = sampling.generate_data(observation_noise=0.1, **kwargs)
    tc = np.asarray(clean["trajectories"])
    tn = np.asarray(noisy["trajectories"])
    diff = tn - tc
    airborne = tc[..., 2] > 0
    assert np.abs(diff[airborne]).max() > 0.01
    assert diff[airborne].std() == pytest.approx(0.1, rel=0.3)
    if (~airborne).any():
        assert np.abs(diff[~airborne]).max() == 0.0
    np.testing.assert_allclose(clean["x0_z"], noisy["x0_z"])


PRIOR_FAMILY_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "data")

# Per-prior summary-statistic expectations derived analytically from the
# reference's declarative specs (reference configs/data/*.yaml):
#   - config/big/windy are byte-identical in the reference, so one row covers
#     them; gamma(9.81, 1) gravity has mean 9.81, std sqrt(9.81)=3.13.
#   - old: g ~ U(9.80, 9.82), m ~ U(0.5, 1.5), one-sided wind radius U(0,10).
#   - throw_upwards: active thrust a.std=4 (spherical); wide v0.
#   - throw_upwards_no_a: thrust exactly zero; g ~ U(9.80, 9.82).
_PRIOR_STATS = {
    "config": dict(g_mean=9.81, g_std=3.13, m_mean=0.30, a_zero=True),
    "big": dict(g_mean=9.81, g_std=3.13, m_mean=0.30, a_zero=True),
    "windy": dict(g_mean=9.81, g_std=3.13, m_mean=0.30, a_zero=True),
    "old": dict(g_mean=9.81, g_std=0.0058, m_mean=1.0, a_zero=True),
    "throw_upwards": dict(g_mean=9.81, g_std=3.13, m_mean=0.30, a_zero=False),
    "throw_upwards_no_a": dict(g_mean=9.81, g_std=0.0058, m_mean=0.30, a_zero=True),
}


@pytest.mark.parametrize("name", sorted(_PRIOR_STATS))
def test_prior_family_distributions(name):
    """Each ported prior spec (configs/data/*.yaml, mirroring the reference's
    six-file family, reference configs/data/config.yaml:1-112 and siblings)
    samples with the summary statistics its declarative spec implies."""
    import jax
    from bcnf_tpu.config import load_yaml

    spec = load_yaml(os.path.join(PRIOR_FAMILY_DIR, f"{name}.yaml")).to_dict()
    p = priors.sample_ballistic_parameters(jax.random.PRNGKey(0), 20000, spec, num_cams=2)
    want = _PRIOR_STATS[name]
    g = -np.asarray(p["g_z"])
    assert g.mean() == pytest.approx(want["g_mean"], rel=0.05)
    assert g.std() == pytest.approx(want["g_std"], rel=0.1)
    assert np.asarray(p["m"]).mean() == pytest.approx(want["m_mean"], rel=0.1)
    a_mag = np.linalg.norm(
        np.stack([p["a_x"], p["a_y"], p["a_z"]], axis=-1), axis=-1)
    if want["a_zero"]:
        assert np.abs(a_mag).max() == 0.0
    else:
        assert a_mag.std() > 1.0  # active thrust (std=4 spherical)
    # every spec must provide the full camera-geometry block for generation
    assert np.asarray(p["cam_heights"]).min() >= 0.4
    assert np.asarray(p["cam_heights"]).max() <= 1.4


def test_generate_accepts_prior_family_config_file(tmp_path):
    """`bcnf-tpu generate -c configs/data/<any>.yaml` path: generate_data
    accepts each family spec as a config file (VERDICT r4 demand #6)."""
    out = sampling.generate_data(
        config_file=os.path.join(PRIOR_FAMILY_DIR, "old.yaml"),
        n=4, output_type="trajectories", dt=1 / 15, T=0.5,
        do_filter=False, seed=0, batch_size=8,
    )
    assert len(out["trajectories"]) == 4


def test_simple_2D_camera_observation_std_propagates():
    """`simple_2D_camera_observation(noise=True, std=...)` must forward `std`
    to the noise model (reference `src/bcnf/simulation/observation.py:13-21`)
    instead of silently using the default sigma=0.1."""
    import jax
    from bcnf_tpu.simulation.observation import simple_2D_camera_observation

    key = jax.random.PRNGKey(0)
    p = np.ones((4096, 3), dtype=np.float32)  # airborne (z=1>0)
    obs_big = simple_2D_camera_observation(p, key=key, noise=True, std=2.0)
    obs_small = simple_2D_camera_observation(p, key=key, noise=True, std=0.1)
    assert obs_big.shape == (4096, 2)
    assert np.asarray(obs_big - p[:, [0, 2]]).std() == pytest.approx(2.0, rel=0.1)
    assert np.asarray(obs_small - p[:, [0, 2]]).std() == pytest.approx(0.1, rel=0.1)
    # noiseless path: pure projection
    np.testing.assert_allclose(
        np.asarray(simple_2D_camera_observation(p)), p[:, [0, 2]])


def test_generate_data_videos():
    data = sampling.generate_data(
        prior_config=PRIOR,
        n=2,
        output_type="videos",
        dt=1 / 10,
        T=0.5,
        do_filter=False,
        seed=1,
        batch_size=4,
        renderer="analytic",
    )
    assert len(data["videos"]) == 2
    assert data["videos"][0].shape == (2, 5, 90, 160)
