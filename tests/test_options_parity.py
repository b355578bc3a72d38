"""Flag-for-flag parity with the reference argparse tree.

The reference exposes a module-level ``parser`` (``var_sep/options.py:26``);
every one of its flags must exist here with the same default and (where
constrained) the same choices, so any README/paper command line parses to
the same configuration.  Guards against silent drift as the TPU build's
option surface grows (it is a superset: --precision, --resume, ...).
"""

import os
import sys
import types

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")

# Reference flags whose values are torch/CUDA-machinery, accepted by this
# build for command-line compatibility but mapped or ignored (documented
# in cli/options.py): defaults need not match.
EXEMPT = {
    "device",       # GPU index -> meaningless on TPU (accepted, ignored)
    "num_workers",  # DataLoader workers -> no host loader processes
    "torch_amp",    # AMP -> bf16 policy via --precision
    "apex_amp",
}


def _ref_parser():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from var_sep.options import parser

    return parser


def _actions(parser):
    return {a.dest: a for a in parser._actions if a.dest != "help"}


def test_every_reference_flag_exists_with_same_default():
    from spatiotemporal_variable_separation_tpu.cli.options import build_parser

    ref = _actions(_ref_parser())
    ours = _actions(build_parser())
    missing = sorted(set(ref) - set(ours))
    assert not missing, f"reference flags absent here: {missing}"
    drift = {}
    for dest, ra in ref.items():
        if dest in EXEMPT:
            continue
        oa = ours[dest]
        if ra.default != oa.default:
            drift[dest] = (ra.default, oa.default)
        # choices may be a superset here (e.g. init 'xavier', which the
        # reference's init_net supports but its CLI never exposed) — every
        # reference-legal value must stay legal.
        if ra.choices is not None and not set(ra.choices) <= set(oa.choices or []):
            drift[dest] = (f"choices {ra.choices}", f"choices {oa.choices}")
    assert not drift, f"default/choices drift vs reference: {drift}"


def test_reference_recipe_flags_all_consumed():
    # the union of every README recipe flag (tests/test_recipes.py) is a
    # subset of the reference parser's surface — sanity that EXEMPT plus
    # the shared dests fully cover real command lines.
    ref = _actions(_ref_parser())
    from tests.test_recipes import RECIPES

    import shlex

    for recipe in RECIPES.values():
        for tok in shlex.split(recipe):
            if tok.startswith("--"):
                dest = tok[2:]
                # argparse prefix-matching (--gain_res) resolves against
                # the full flag set; expand to any dest it prefixes.
                assert any(d == dest or d.startswith(dest) for d in ref), tok
