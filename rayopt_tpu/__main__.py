"""One-shot lens analysis CLI:

    python -m rayopt_tpu <prescription> [-o report.html] [...]

Loads a prescription in any supported format (.zmx, .len, .seq,
.yaml/.yml, .json, or a bundled model name like "double_gauss"),
runs the full Analysis report, prints the text tables, and optionally
writes the self-contained HTML report.  The reference exposes only
the library/codev module CLIs; this is the missing front door.
"""

import argparse
import os
import sys


def load_system(path):
    from .models import PRESCRIPTIONS
    if path in PRESCRIPTIONS:
        return PRESCRIPTIONS[path]()
    ext = os.path.splitext(path)[1].lower()
    if not os.path.exists(path):
        raise SystemExit(
            "no such file or bundled model: %r\nbundled models: %s"
            % (path, ", ".join(sorted(PRESCRIPTIONS))))
    data = open(path, "rb").read()
    if ext == ".zmx":
        from .io.zemax import zmx_to_system
        if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
            text = data.decode("utf-16")
        else:
            text = data.decode("latin1")
        return zmx_to_system(text)
    if ext == ".len":
        from .io.oslo import len_to_system
        return len_to_system(data.decode("latin1"))
    if ext == ".seq":
        from .io.codev import seq_to_system
        return seq_to_system(data.decode("latin1"))
    if ext in (".yaml", ".yml"):
        from .formats import system_from_yaml
        return system_from_yaml(data.decode("utf-8"))
    if ext == ".json":
        from .formats import system_from_json
        return system_from_json(data.decode("utf-8"))
    raise SystemExit("unsupported prescription format: %r (know "
                     ".zmx .len .seq .yaml .json and model names %s)"
                     % (path, "/".join(sorted(PRESCRIPTIONS))))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m rayopt_tpu",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prescription",
                    help="lens file (.zmx/.len/.seq/.yaml/.json) or "
                         "bundled model name")
    ap.add_argument("-o", "--html", default=None,
                    help="write the self-contained HTML report here")
    ap.add_argument("--no-text", action="store_true",
                    help="skip printing the text tables")
    ap.add_argument("--no-plot", action="store_true",
                    help="skip all figure generation (text only; "
                         "much faster, -o writes a text-only report)")
    ap.add_argument("--refocus", action="store_true",
                    help="paraxial refocus before the report")
    ap.add_argument("--config", type=int, default=None,
                    help="zoom configuration index to analyze "
                         "(multi-configuration systems)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (skip the accelerator)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("agg")

    s = load_system(args.prescription)
    if args.config is not None:
        s.apply_configuration(args.config, update=False)
    s.update()
    if args.refocus:
        s.paraxial.refocus()
        s.update()

    from .analysis import Analysis
    a = Analysis(s, print=False, plot=not args.no_plot)
    if not args.no_text:
        for block in a.text:
            sys.stdout.write(block)
            sys.stdout.write("\n")
    if args.html:
        a.export_html(args.html)
        print("wrote %s (%d figures)" % (args.html, len(a.figures)))


if __name__ == "__main__":
    main()
