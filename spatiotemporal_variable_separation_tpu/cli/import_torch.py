"""Convert a trained reference (torch) experiment dir into a native one.

Migration entry point for users of the reference implementation: their
``xp_dir`` (``params.json`` + pickled ``ov_Es/ov_Et/t_resnet/decoder.pt``,
``var_sep/utils/helper.py:22-33``) becomes a directory every eval CLI and
the serving surface accept directly.

    varsep-import-torch --ref_xp_dir REF_XP --xp_dir NEW_XP \
        [--epoch N] [--reference_path /path/to/reference/repo]

``--reference_path``: directory that makes ``import var_sep`` work —
unpickling the saved modules needs the reference's classes on sys.path.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-import-torch", description=__doc__)
    p.add_argument("--ref_xp_dir", type=str, metavar="DIR", required=True,
                   help="reference experiment directory to import")
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True,
                   help="output experiment directory (created)")
    p.add_argument("--epoch", type=int, metavar="N", default=None,
                   help="import the epoch-N snapshot (ov_Es_N.pt ...) "
                        "instead of the final one")
    p.add_argument("--reference_path", type=str, metavar="DIR", default=None,
                   help="path under which `import var_sep` resolves")
    args = p.parse_args(argv)

    # Pure host-side conversion: never touch (or wait for) an accelerator.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from spatiotemporal_variable_separation_tpu.utils.transplant import (
        import_reference_checkpoint,
    )

    import_reference_checkpoint(args.ref_xp_dir, args.xp_dir, epoch=args.epoch,
                                reference_root=args.reference_path)


if __name__ == "__main__":
    main()
