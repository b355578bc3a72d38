"""Full-basin SST stretch config (--zone_size): the fully-convolutional
encoderSST stack (reference ``var_sep/networks/conv.py:323-426``, fixed to
64x64 zones there via ``data/sst.py:42``) scales to arbitrary square grids.
Covers: the CF-packed basin generator, loader size inference + unpacking,
config validation, registry mismatch detection, and a factory-built model
forward at a non-reference grid size.
"""

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.core.config import (
    ConfigError,
    ExperimentConfig,
)
from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc
from spatiotemporal_variable_separation_tpu.data.sst import SST

SIZE = 32  # small stretch grid: exercises size!=64 cheaply


@pytest.fixture(scope="module")
def basin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sst_basin")
    sc.make_sst(str(d), zones=(1, 2), n_days=60, seed=3, size=SIZE)
    return str(d)


def _cfg(basin_dir, **kw):
    base = dict(data="sst", architecture="encoderSST",
                decoder_architecture="decoderSST", mixing="concat",
                skipco=True, code_size_s=8, code_size_t=8, nt_cond=4,
                nt_pred=6, offset=0, batch_size=4, zone_size=SIZE,
                zones=(1, 2), data_dir=basin_dir, precision="f32")
    base.update(kw)
    return ExperimentConfig(**base)


def test_basin_generator_cf_packed(basin_dir):
    import h5py

    with h5py.File(f"{basin_dir}/data_1.nc", "r") as f:
        d = f["thetao"]
        assert d.dtype == np.int16
        assert "scale_factor" in d.attrs and "add_offset" in d.attrs
        assert d.shape == (60, SIZE, SIZE)


def test_loader_infers_grid_size_and_unpacks(basin_dir):
    ds = SST(basin_dir, 4, 6, True, zones=(1, 2))
    assert ds.zone_size == SIZE
    cond, target = ds[0]
    assert cond.shape == (4, SIZE, SIZE, 1)
    assert target.shape == (6, SIZE, SIZE, 1)
    # normalized fields: CF unpacking happened (values O(1), not int16 raw)
    assert abs(float(np.mean(cond))) < 1.0
    assert 0.1 < float(np.std(cond)) < 10.0


def test_mixed_grid_sizes_rejected(basin_dir, tmp_path):
    import shutil

    d = tmp_path / "mixed"
    d.mkdir()
    shutil.copy(f"{basin_dir}/data_1.nc", d / "data_1.nc")
    sc.make_sst(str(d), zones=(2,), n_days=60, seed=3, size=SIZE * 2)
    with pytest.raises(ValueError, match="unequal grid sizes"):
        SST(str(d), 4, 6, True, zones=(1, 2))


def test_config_validation():
    with pytest.raises(ConfigError, match="only to --data sst"):
        ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                         code_size_s=8, code_size_t=8, nt_cond=5, nt_pred=4,
                         offset=5, zone_size=128).validate()
    with pytest.raises(ConfigError, match="multiple of 4"):
        ExperimentConfig(data="sst", architecture="encoderSST",
                         decoder_architecture="decoderSST",
                         mixing="concat", skipco=True, code_size_s=8,
                         code_size_t=8, nt_cond=4, nt_pred=6, offset=0,
                         zone_size=30).validate()


def test_registry_grid_mismatch(basin_dir):
    from spatiotemporal_variable_separation_tpu.data.registry import (
        make_train_dataset,
    )

    cfg = _cfg(basin_dir, zone_size=64)  # config says 64, corpus is SIZE
    with pytest.raises(ValueError, match="pass --zone_size"):
        make_train_dataset(cfg)


def test_factory_model_forward_at_stretch_size(basin_dir):
    import jax
    import jax.numpy as jnp

    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )

    cfg = _cfg(basin_dir)
    cfg.validate()
    assert cfg.frame_shape == (SIZE, SIZE, 1)
    model = build_separable_network(cfg)
    cond = jnp.zeros((2, cfg.nt_cond, SIZE, SIZE, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 3, train=False)
    fc, t_codes, _, _ = model.apply(v, cond, 3, train=False,
                                    method=model.get_forecast)
    assert fc.shape == (2, 3, SIZE, SIZE, 1)
    # spatial code is (SIZE/4, SIZE/4, code) — the stretch scaling property
    s_code, _skips = model.apply(v, cond, train=False, method=model.encode_s)
    assert s_code.shape[1:3] == (SIZE // 4, SIZE // 4)
