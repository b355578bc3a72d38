"""Every README training recipe (reference ``README.md:71-95``) must parse
through the CLI with identical flags and produce a model that runs one
training step."""

import shlex

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.cli.options import build_parser, config_from_args
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network

RECIPES = {
    "mnist": "--data mnist --epochs 800 --beta1 0.5 --scheduler",
    "chairs": ("--data chairs --epochs 120 --gain_resnet 0.71 --code_size_t 10 "
               "--architecture resnet --decoder_architecture dcgan --lamb_ae 1 --lamb_s 1"),
    "taxibj": ("--data taxibj --nt_cond 4 --nt_pred 4 --lr 4e-5 --batch_size 100 "
               "--epochs 550 --scheduler --scheduler_decay 0.2 "
               "--scheduler_milestones 250 300 350 400 450 --offset 4 "
               "--gain_resnet 0.71 --architecture vgg --lamb_ae 45 --lamb_s 0.0001"),
    "sst": ("--data sst --nt_cond 4 --nt_pred 6 --epochs 30 --code_size_t 64 "
            "--code_size_s 196 --gain_res 0.2 --offset 0 --gain_resnet 0.71 "
            "--architecture encoderSST --decoder_architecture decoderSST "
            "--lamb_ae 1 --lamb_s 100 --lamb_t 5e-6 --skipco --n_blocks 2"),
    "wave": ("--data wave --nt_cond 5 --nt_pred 20 --epochs 250 --batch_size 128 "
             "--code_size_t 32 --code_size_s 32 --gain_resnet 0.71 --offset 5 "
             "--n_blocks 3 --mixing mul --architecture mlp --enc_hidden_size 1200 "
             "--dec_hidden_size 1200 --dec_n_layers 4 --lamb_ae 1"),
    "wave_partial": ("--data wave_partial --nt_cond 5 --nt_pred 20 --epochs 250 "
                     "--batch_size 128 --code_size_t 32 --code_size_s 32 "
                     "--gain_resnet 0.71 --offset 5 --n_blocks 3 --mixing mul "
                     "--architecture mlp --enc_hidden_size 2400 --dec_hidden_size 150 "
                     "--lamb_ae 1"),
}


def _cfg(recipe: str):
    argv = shlex.split(recipe) + ["--xp_dir", "/tmp/xp", "--data_dir", "/tmp/data",
                                  "--precision", "f32"]
    args = build_parser().parse_args(argv)
    return config_from_args(args).validate()


@pytest.mark.parametrize("name", list(RECIPES))
def test_recipe_parses_and_validates(name):
    cfg = _cfg(RECIPES[name])
    assert cfg.data == name
    if name == "sst":
        # `--gain_res 0.2` is an argparse prefix of --gain_resnet; the later
        # explicit --gain_resnet 0.71 wins (same behaviour as the reference).
        assert cfg.gain_resnet == 0.71
        assert cfg.skipco and cfg.n_blocks == 2
    if name == "mnist":
        assert cfg.beta1 == 0.5 and cfg.scheduler


@pytest.mark.parametrize("name", list(RECIPES))
def test_recipe_model_one_loss_step(name):
    cfg = _cfg(RECIPES[name])
    model = build_separable_network(cfg)
    rng = np.random.default_rng(0)
    # batch 2 to keep CPU time sane; nt dims from the recipe.
    cond = jnp.asarray(rng.random((2, cfg.nt_cond) + cfg.frame_shape), jnp.float32)
    target = jnp.asarray(rng.random((2, cfg.nt_pred) + cfg.frame_shape), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)
    (loss, metrics), _ = model.apply(
        variables, cond, target, jnp.int32(cfg.nt_cond), cfg.offset,
        cfg.lamb_ae, cfg.lamb_s, cfg.effective_lamb_t, cfg.lamb_pred,
        cfg.average_tloss, True,
        method=model.compute_losses, mutable=["batch_stats"])
    assert np.isfinite(float(loss))
