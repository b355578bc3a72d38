"""Device-resident WaveEq window sampler tests."""

import numpy as np

import jax

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.registry import make_device_generator
from spatiotemporal_variable_separation_tpu.data.wave_device import DeviceWaveEq
from spatiotemporal_variable_separation_tpu.data.wave_eq import WaveEq, generate_dataset, generate_pixels


def test_device_windows_match_host(tmp_path):
    generate_dataset(str(tmp_path), size=5, seq_len=30, batch=5)
    host = WaveEq(str(tmp_path), nt_cond=3, seq_len=8, train=True, downsample=2)
    dev = DeviceWaveEq.from_host_dataset(host)
    assert len(dev) == len(host)
    cond, target = dev.generate_device_batch(jax.random.PRNGKey(0), 6)
    assert cond.shape == (6, 3, 64, 64, 1) and target.shape == (6, 5, 64, 64, 1)
    # every sampled window must exist verbatim in the host dataset
    full = np.concatenate([np.asarray(cond), np.asarray(target)], axis=1)
    host_all = host.data  # (N, nt, H, W, 1)
    for w in full:
        found = False
        for s in range(host_all.shape[0]):
            for i in range(host.windows):
                if np.array_equal(host_all[s, i:i + 8], w):
                    found = True
                    break
            if found:
                break
        assert found


def test_registry_device_generator_wave(tmp_path):
    generate_dataset(str(tmp_path), size=5, seq_len=30, batch=5)
    generate_pixels(str(tmp_path), number=10)
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, nt_cond=3, nt_pred=3,
                           offset=3, data_dir=str(tmp_path), precision="f32")
    gen = make_device_generator(cfg)
    assert gen is not None
    c, t = gen.generate_device_batch(jax.random.PRNGKey(1), 4)
    assert c.shape == (4, 3, 64, 64, 1)

    cfg2 = ExperimentConfig(data="wave_partial", architecture="mlp", mixing="mul",
                            code_size_s=8, code_size_t=8, nt_cond=3, nt_pred=3,
                            offset=3, n_wave_points=10, data_dir=str(tmp_path),
                            precision="f32")
    gen2 = make_device_generator(cfg2)
    c2, t2 = gen2.generate_device_batch(jax.random.PRNGKey(1), 4)
    assert c2.shape == (4, 3, 10, 1)

    cfg3 = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                            code_size_s=8, code_size_t=8, nt_cond=3, nt_pred=3,
                            offset=3, data_dir=str(tmp_path), precision="f32",
                            device_datagen=False)
    assert make_device_generator(cfg3) is None
