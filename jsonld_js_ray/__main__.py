"""CLI: document-level JSON-LD operations and the Ray KG pipeline.

Usage:
    python -m jsonld_js_ray expand   doc.json            [--base IRI]
    python -m jsonld_js_ray compact  doc.json ctx.json
    python -m jsonld_js_ray flatten  doc.json [ctx.json]
    python -m jsonld_js_ray frame    doc.json frame.json
    python -m jsonld_js_ray tordf    doc.json            # N-Quads out
    python -m jsonld_js_ray canonize doc.json            # URDNA2015
    python -m jsonld_js_ray fromrdf  data.nq
    python -m jsonld_js_ray run-kg   SF_DIR OUT_DIR [--full] [--cpus N]

Document ops are pure Python (no Ray session); ``run-kg`` owns a local
Ray session (the only CLI path that does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str):
    with open(path) as f:
        return json.load(f)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="jsonld_js_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, nargs in (("expand", 1), ("tordf", 1), ("canonize", 1),
                        ("fromrdf", 1), ("compact", 2), ("frame", 2)):
        sp = sub.add_parser(name)
        sp.add_argument("files", nargs=nargs)
        sp.add_argument("--base", default="")

    sp = sub.add_parser("flatten")
    sp.add_argument("files", nargs="+")
    sp.add_argument("--base", default="")

    sp = sub.add_parser("run-kg")
    sp.add_argument("sf_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--full", action="store_true",
                    help="include entity canonicalization + mentions")
    sp.add_argument("--cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "run-kg":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .pipelines.kg import run_full_kg_pipeline, run_kg_pipeline

        fn = run_full_kg_pipeline if args.full else run_kg_pipeline
        metrics = fn(args.sf_dir, args.out_dir)
        print(json.dumps(metrics))
        ray.shutdown()
        return 0

    from . import api

    opts = {"base": args.base}
    if args.cmd == "expand":
        out = api.expand(_load(args.files[0]), opts)
    elif args.cmd == "compact":
        out = api.compact(_load(args.files[0]), _load(args.files[1]), opts)
    elif args.cmd == "flatten":
        ctx = _load(args.files[1]) if len(args.files) > 1 else None
        out = api.flatten(_load(args.files[0]), ctx, opts)
    elif args.cmd == "frame":
        out = api.frame(_load(args.files[0]), _load(args.files[1]), opts)
    elif args.cmd == "tordf":
        print(api.to_rdf(_load(args.files[0]),
                         {**opts, "format": "application/n-quads"}), end="")
        return 0
    elif args.cmd == "canonize":
        print(api.canonize(_load(args.files[0]), opts), end="")
        return 0
    elif args.cmd == "fromrdf":
        with open(args.files[0]) as f:
            out = api.from_rdf(f.read(), opts)
    else:  # pragma: no cover
        p.error(f"unknown command {args.cmd}")
        return 2
    json.dump(out, sys.stdout, indent=1, ensure_ascii=False)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
