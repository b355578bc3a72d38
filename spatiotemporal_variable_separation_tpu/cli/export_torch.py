"""Convert a trained native experiment dir into a reference (torch) one.

The reverse of ``cli.import_torch``: models trained in this framework
become the reference's experiment layout (``params.json`` + pickled
``ov_Es/ov_Et/t_resnet/decoder.pt``, ``var_sep/utils/helper.py:22-33``)
so the reference's own eval scripts (``var_sep/test/*/test*.py``) can
score them, completing the migration loop in both directions.

    varsep-export-torch --xp_dir NATIVE_XP --ref_xp_dir TORCH_XP \
        [--name CKPT] [--reference_path /path/to/reference/repo]

``--reference_path``: directory that makes ``import var_sep`` work — the
exported pickles are genuine reference module classes, constructed through
the reference's own factory (``var_sep/networks/factory.py``).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-export-torch", description=__doc__)
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True,
                   help="native experiment directory to export")
    p.add_argument("--ref_xp_dir", type=str, metavar="DIR", required=True,
                   help="output reference-layout experiment dir (created)")
    p.add_argument("--name", type=str, metavar="CKPT", default=None,
                   help="checkpoint to export (e.g. 'final' or an epoch "
                        "number; default: the newest)")
    p.add_argument("--reference_path", type=str, metavar="DIR", default=None,
                   help="path under which `import var_sep` resolves")
    args = p.parse_args(argv)

    # Pure host-side conversion: never touch (or wait for) an accelerator.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from spatiotemporal_variable_separation_tpu.utils.export import (
        export_reference_checkpoint,
    )

    export_reference_checkpoint(args.xp_dir, args.ref_xp_dir, name=args.name,
                                reference_root=args.reference_path)


if __name__ == "__main__":
    main()
