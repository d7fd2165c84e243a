"""Command-line entry points mirroring the reference's ``cmd/`` tools.

    python -m geobuf_ray.cli geojson2geobuf IN.geojson OUT_DIR
    python -m geobuf_ray.cli geobuf2geojson IN.geobuf OUT_DIR [--single FILE]
    python -m geobuf_ray.cli read IN.geobuf            (CSV to stdout)
    python -m geobuf_ray.cli bench IN.geojson OUT_DIR  (read/write timings)
    python -m geobuf_ray.cli tile IN.geobuf OUT_DIR -z 8 [--clip]
                                  [--combine OUT.geobuf]

References: ``cmd/geojson2geobuf``, ``cmd/geobuf2geojson``,
``cmd/read_geobuf`` (ReadGeobufCSV), ``cmd/bench_geobuf``
(BenchmarkRead/BenchmarkWrite), and the splitcombine flagship.

CLI scripts own their Ray session (guarded init; the library itself
never calls ray.init).
"""

from __future__ import annotations

import argparse
import sys
import time


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True)
    return ray


def cmd_geojson2geobuf(args) -> int:
    _ray()
    from .pipelines.convert import geojson_to_geobuf

    manifest = geojson_to_geobuf([args.infile], args.outdir)
    n = sum(manifest["num_features"].to_pylist())
    print(f"wrote {n} features to {args.outdir} "
          f"({manifest.num_rows} stream files)")
    return 0


def cmd_geobuf2geojson(args) -> int:
    _ray()
    from .pipelines.convert import geobuf_to_geojson

    geobuf_to_geojson([args.infile], args.outdir, single_file=args.single)
    print(f"converted {args.infile} -> "
          f"{args.single or args.outdir}")
    return 0


def cmd_read(args) -> int:
    _ray()
    from .io.geobuf_file import read_geobuf
    from .pipelines.export import csv_projection_batch
    from .stages.codec_stages import decode as decode_stage

    ds = decode_stage(read_geobuf([args.infile]))
    first = True
    for batch in ds.map_batches(
        csv_projection_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        import io

        import pyarrow.csv as pacsv

        buf = io.BytesIO()
        pacsv.write_csv(
            batch, buf,
            write_options=pacsv.WriteOptions(include_header=first))
        sys.stdout.write(buf.getvalue().decode())
        first = False
    return 0


def cmd_bench(args) -> int:
    _ray()
    import os

    from .pipelines.convert import geobuf_to_geojson, geojson_to_geobuf

    t0 = time.perf_counter()
    manifest = geojson_to_geobuf([args.infile], args.outdir)
    t_write = time.perf_counter() - t0
    n = sum(manifest["num_features"].to_pylist())
    paths = [p for p in manifest["path"].to_pylist()]
    from .io.geobuf_file import read_geobuf
    from .stages.codec_stages import decode as decode_stage

    t0 = time.perf_counter()
    n_read = decode_stage(read_geobuf(paths)).count()
    t_read = time.perf_counter() - t0
    size_buf = sum(os.path.getsize(p) for p in paths)
    size_json = os.path.getsize(args.infile)
    print(f"features: {n} (read back {n_read})")
    print(f"geobuf write: {t_write:.2f}s   geobuf read+decode: {t_read:.2f}s")
    print(f"size: geojson {size_json / 1e6:.2f} MB -> geobuf "
          f"{size_buf / 1e6:.2f} MB ({size_json / max(size_buf, 1):.2f}x)")
    return 0


def cmd_tile(args) -> int:
    _ray()
    from .io.geobuf_file import read_geobuf
    from .pipelines.tiling import split_combine, tile_pyramid
    from .stages.codec_stages import decode as decode_stage

    ds = decode_stage(read_geobuf([args.infile]))
    if getattr(args, "levels", 1) > 1:
        # tile_pyramid fans out UNCLIPPED leaves and byte-concatenates
        # child frames into parents (a spanning feature appears once
        # per child) — silently ignoring an explicit --clip/--combine
        # would hand the user a different result than asked for
        if args.clip or args.combine:
            print("error: --clip/--combine are not supported with "
                  "--levels > 1 (the pyramid rollup byte-concatenates "
                  "unclipped child tiles); run per-level split_combine "
                  "instead", file=sys.stderr)
            return 2
        mans = tile_pyramid(ds, args.outdir, args.zoom,
                            levels=args.levels)
        for z in sorted(mans, reverse=True):
            print(f"z{z}: {mans[z].num_rows} tiles")
        print(f"pyramid ({args.levels} levels) -> {args.outdir}")
        return 0
    manifest = split_combine(ds, args.outdir, args.zoom, clip=args.clip,
                             combine_path=args.combine)
    print(f"{manifest.num_rows} tiles -> {args.outdir}"
          + (f"; combined index {args.combine}" if args.combine else ""))
    return 0


def cmd_job(args) -> int:
    """Cluster job entrypoint (north_rule: "run via ray job submit").

    Submitted as::

        ray job submit --working-dir . -- \
            python -m geobuf_ray.cli job QUERY --sf-dir DIR --out OUT

    Connects to the submitting cluster (``RAY_ADDRESS`` is set inside a
    Ray job; here it is the preset single node), runs one registered
    pipeline from the driver contract, streams the result to
    partitioned parquet (resumable output layout), and commits a
    job-level metrics record (rows, wall seconds, rows/sec) next to it.
    """
    import json
    import os

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone it is unset/local and this starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(__file__), "..",
                                      "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; have: {sorted(qs)}",
              file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    os.makedirs(args.out, exist_ok=True)
    # refuse a dirty output dir: write_parquet emits uniquely-named
    # files, so re-running into leftovers would mix two generations
    # and double-count rows (partition-level resume lives in the
    # pipelines' checkpoint layer, not here)
    stale = [x for x in os.listdir(args.out) if not x.startswith(".")]
    if stale:
        print(f"output dir {args.out!r} is not empty "
              f"({len(stale)} entries) — refusing to mix generations",
              file=sys.stderr)
        return 3
    res = qs[args.query](args.sf_dir)
    if isinstance(res, ray.data.Dataset):
        res.write_parquet(args.out)
        n = sum(1 for f in os.listdir(args.out) if f.endswith(".parquet"))
        import pyarrow.dataset as pads

        rows = pads.dataset(args.out).count_rows()
    else:  # small pyarrow Table / pandas result
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        rows, n = tbl.num_rows, 1
    wall = time.perf_counter() - t0
    rec = {"query": args.query, "sf_dir": args.sf_dir, "rows": rows,
           "files": n, "wall_s": round(wall, 3),
           "rows_per_s": round(rows / wall, 1) if wall else None}
    tmp = os.path.join(args.out, "_metrics.json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(args.out, "_metrics.json"))
    print(json.dumps(rec))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="geobuf_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("geojson2geobuf")
    s.add_argument("infile")
    s.add_argument("outdir")
    s.set_defaults(fn=cmd_geojson2geobuf)

    s = sub.add_parser("geobuf2geojson")
    s.add_argument("infile")
    s.add_argument("outdir")
    s.add_argument("--single", default=None,
                   help="assemble one FeatureCollection file")
    s.set_defaults(fn=cmd_geobuf2geojson)

    s = sub.add_parser("read")
    s.add_argument("infile")
    s.set_defaults(fn=cmd_read)

    s = sub.add_parser("bench")
    s.add_argument("infile")
    s.add_argument("outdir")
    s.set_defaults(fn=cmd_bench)

    s = sub.add_parser("tile")
    s.add_argument("infile")
    s.add_argument("outdir")
    s.add_argument("-z", "--zoom", type=int, required=True)
    s.add_argument("--clip", action="store_true",
                   help="clip features to tiles (tileclip semantics)")
    s.add_argument("--combine", default=None,
                   help="also write one gob-indexed combined geobuf")
    s.add_argument("--levels", type=int, default=1,
                   help=">1: write a multi-level Combine pyramid "
                        "(zoom down to zoom-levels+1), gob-indexed "
                        "per level")
    s.set_defaults(fn=cmd_tile)

    s = sub.add_parser("job", help="ray-job-submit entrypoint: run one "
                       "registered pipeline, write parquet + metrics")
    s.add_argument("query")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_job)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
