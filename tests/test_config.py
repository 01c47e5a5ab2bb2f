"""Config loader, parameter mapping, and IO tests (host-only, fast)."""

import os
import pickle

import numpy as np
import pytest

from bcnf_tpu.config import Config, ParameterIndexMapping, load_config, sub_root_path
from bcnf_tpu.utils.io import load_data, save_data


def test_sci_notation_coercion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "optimizer:\n  kwargs:\n    lr: 2e-4\n"
        "training:\n  threshold: 1e-1\n  n_epochs: 50_000\n  name: test2e\n"
    )
    cfg = load_config(str(p), verify=False)
    assert cfg["optimizer"]["kwargs"]["lr"] == pytest.approx(2e-4)
    assert isinstance(cfg["optimizer"]["kwargs"]["lr"], float)
    assert cfg["training"]["threshold"] == pytest.approx(0.1)
    assert cfg["training"]["n_epochs"] == 50000  # YAML 1.1 underscore int
    assert cfg["training"]["name"] == "test2e"  # not numeric-looking


def test_root_templating(tmp_path):
    root = sub_root_path("{{BCNF_ROOT}}/data")
    assert "{{BCNF_ROOT}}" not in root
    assert os.path.isabs(root)


def test_config_case_insensitive_access():
    cfg = Config({"Global": Config({"dtype": "float32"})})
    assert cfg["global"]["dtype"] == "float32"
    assert "GLOBAL" in cfg
    assert cfg.to_dict() == {"Global": {"dtype": "float32"}}


def test_parameter_index_mapping_roundtrip():
    m = ParameterIndexMapping(["a", "b", "c"])
    d = {"a": np.array([1.0, 4.0]), "b": np.array([2.0, 5.0]), "c": np.array([3.0, 6.0])}
    vec = m.vectorize(d)
    assert vec.shape == (2, 3)
    np.testing.assert_array_equal(vec[0], [1, 2, 3])
    back = m.dictify(vec[1])
    assert back == {"a": 4.0, "b": 5.0, "c": 6.0}
    assert m["b"] == 1 and "c" in m and len(m) == 3


def test_parameter_alias_g_gz():
    """SURVEY.md Q8: 'g' and 'g_z' resolve to each other."""
    m = ParameterIndexMapping(["g"])
    vec = m.vectorize({"g_z": np.array([-9.81])})
    np.testing.assert_allclose(vec, [[-9.81]])
    m2 = ParameterIndexMapping(["g_z"])
    np.testing.assert_allclose(m2.vectorize({"g": np.array([-9.81])}), [[-9.81]])
    with pytest.raises(KeyError):
        m.vectorize({"x": np.array([1.0])})


def test_load_data_key_aliasing(tmp_path):
    save_data({"traj": [np.zeros((3, 3))], "m": [1.0]}, str(tmp_path / "d.pkl"))
    data = load_data(str(tmp_path / "d.pkl"))
    assert "trajectories" in data and "traj" not in data


def test_load_data_directory_shards(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        with open(d / f"s{i}.pkl", "wb") as f:
            pickle.dump({"m": [float(i)], "trajectories": [np.zeros(2)]}, f)
    data = load_data(str(d))
    assert data["m"] == [0.0, 1.0, 2.0]
    with open(d / "bad.pkl", "wb") as f:
        pickle.dump({"m": [9.0]}, f)  # missing trajectories -> length mismatch
    with pytest.raises(ValueError):
        load_data(str(d))


def test_load_data_keep_output_type(tmp_path):
    save_data(
        {"trajectories": [np.zeros(2)], "videos": [np.zeros(2)], "m": [1.0]},
        str(tmp_path / "d.pkl"),
    )
    data = load_data(str(tmp_path / "d.pkl"), keep_output_type="trajectories")
    assert "videos" not in data and "trajectories" in data
