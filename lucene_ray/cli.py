"""Cluster job entrypoint — the ``ray job submit`` surface of the engine.

The north-rule deployment shape: the SAME commands run locally and on a
fixed-size multi-node Ray cluster, because every subcommand drives the
lazy Ray Data pipelines and actor pools; only ``ray.init`` differs.

    # local
    python -m lucene_ray.cli build --source /data/corpus --index /idx
    # cluster (ray job submit picks RAY_ADDRESS from the job environment)
    ray job submit --working-dir . -- \
        python -m lucene_ray.cli build --source s3dir --index shareddir

Subcommands:
    build    full index build (resumable — per-partition lineage in the
             manifest means a re-submitted job skips finished partitions
             and re-enters mid-shuffle, SURVEY §2.1)
    add      incremental NRT add of new source files
    delete   delete-by-term over a stored column
    compact  tiered-policy auto compaction (or explicit --segments)
    search   classic-syntax query -> JSON rows on stdout
    count    exact hit count
    stats    manifest stats (doc/term counts, per-stage seconds, lineage)

Ray ownership: ONLY this CLI calls ray.init (guarded), per the repo's
driver contract — library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up() -> None:
    import ray

    if not ray.is_initialized():
        # on a cluster, RAY_ADDRESS (set by ray job submit) wins; locally
        # this starts a single-node session
        ray.init(include_dashboard=False, logging_level="ERROR")


def _cfg_from_args(args) -> "IndexConfig":
    from lucene_ray.index.build import IndexConfig

    kw = {}
    if args.content_col:
        kw["content_col"] = args.content_col
    if args.id_cols:
        kw["id_cols"] = tuple(args.id_cols.split(","))
    if args.keyword_cols:
        kw["keyword_cols"] = tuple(args.keyword_cols.split(","))
    if args.text_cols:
        kw["text_cols"] = tuple(args.text_cols.split(","))
    if args.rows_per_partition:
        kw["target_rows_per_partition"] = args.rows_per_partition
    if args.partitions_per_segment:
        kw["partitions_per_segment"] = args.partitions_per_segment
    if args.grammar:
        kw["grammar"] = args.grammar
    if args.index_sort:
        kw["index_sort"] = tuple(args.index_sort.split(","))
    if args.with_offsets:
        kw["with_offsets"] = True
    if args.stopwords:
        kw["stopwords"] = tuple(args.stopwords.split(","))
    return IndexConfig(**kw)


def cmd_build(args) -> int:
    _ray_up()
    from lucene_ray.index.build import build_index

    m = build_index(args.source, args.index, _cfg_from_args(args),
                    resume=not args.no_resume)
    print(json.dumps({"doc_count": m.doc_count,
                      "segments": len(m.segments),
                      "stats": m.stats}, default=str))
    return 0


def cmd_add(args) -> int:
    _ray_up()
    from lucene_ray.index.build import add_documents

    m = add_documents(args.index, args.source)
    print(json.dumps({"doc_count": m.doc_count}))
    return 0


def cmd_delete(args) -> int:
    _ray_up()
    from lucene_ray.index.build import delete_by_term

    vals: list = args.values.split(",")
    if args.numeric:
        vals = [int(v) for v in vals]
    m = delete_by_term(args.index, args.col, vals)
    from lucene_ray.index.build import load_tombstones

    print(json.dumps({"tombstone_generations": list(m.tombstones),
                      "deleted_total": int(len(load_tombstones(args.index, m)))}))
    return 0


def cmd_compact(args) -> int:
    _ray_up()
    if args.segments:
        from lucene_ray.index.build import compact_segments

        ids = [int(s) for s in args.segments.split(",")]
        compact_segments(args.index, ids)
        # same list-of-groups shape as the auto_compact branch below
        print(json.dumps({"merged": [ids]}))
        return 0
    from lucene_ray.index.merge_policy import auto_compact

    merges = auto_compact(args.index)
    print(json.dumps({"merged": merges}))
    return 0


def cmd_split(args) -> int:
    _ray_up()
    from lucene_ray.index.build import load_tombstones
    from lucene_ray.index.split import split_index

    mk, mr = split_index(args.index, args.keep, args.rest, args.col,
                         args.values.split(","),
                         expunge=not args.no_expunge)
    # doc_count is maxDoc (ids stay stable through the split); report LIVE
    # counts (numDocs) — the tombstone mask stays in force on each half
    print(json.dumps({
        "keep_docs": mk.doc_count - len(load_tombstones(args.keep, mk)),
        "rest_docs": mr.doc_count - len(load_tombstones(args.rest, mr)),
    }))
    return 0


def cmd_search(args) -> int:
    _ray_up()
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    reader = IndexReader(args.index)
    s = Searcher(reader)
    if args.xml:
        from lucene_ray.search.xml_parser import parse_xml_query

        cfg = reader.manifest.config
        q = parse_xml_query(
            args.query,
            default_field=cfg.get("content_col") or "content",
            text_fields=tuple(cfg.get("text_cols") or ()),
        )
    else:
        q = args.query
    td = s.search(q, args.k,
                  total_hits_threshold=args.threshold or None)
    cols = args.fields.split(",") if args.fields else None
    docs = reader.lookup_docs(td.doc_ids, columns=cols) if len(td.doc_ids) else None
    stored = docs.to_pylist() if docs is not None else []
    by_gid = {}
    if stored:
        gids = docs.column("doc_id").to_pylist()
        by_gid = {int(g): r for g, r in zip(gids, stored)}
    for rank, (gid, score) in enumerate(zip(td.doc_ids, td.scores), 1):
        row = {"rank": rank, "score": float(score), "doc": by_gid.get(int(gid), {})}
        print(json.dumps(row, default=str))
    print(json.dumps({"total_hits": td.total_hits,
                      "exact_total": bool(td.exact_total)}))
    return 0


def cmd_count(args) -> int:
    _ray_up()
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    print(Searcher(IndexReader(args.index)).count(args.query))
    return 0


def cmd_stats(args) -> int:
    from lucene_ray.index.manifest import Manifest

    m = Manifest.load(args.index)
    print(json.dumps({
        "doc_count": m.doc_count,
        "sum_total_term_freq": m.sum_total_term_freq,
        "segments": len(m.segments),
        "partitions": len(m.partials_done),
        "stats": m.stats,
    }, default=str))
    return 0


def cmd_replicate(args) -> int:
    """Ship the primary's commit point to a replica directory (the
    replicator/nrt surface; incremental, checksum-verified, Ray-task file
    fan-out)."""
    from lucene_ray.index.replicate import sync_replica

    _ray_up()
    stats = sync_replica(
        args.index, args.replica,
        generation=args.generation,
        concurrency=args.concurrency,
        delete_unreferenced=not args.keep_unreferenced,
    )
    print(json.dumps(stats))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lucene_ray",
                                 description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full index build (resumable)")
    b.add_argument("--source", required=True, nargs="+")
    b.add_argument("--index", required=True)
    b.add_argument("--content-col", default=None)
    b.add_argument("--id-cols", default=None)
    b.add_argument("--keyword-cols", default=None)
    b.add_argument("--text-cols", default=None)
    b.add_argument("--index-sort", default=None)
    b.add_argument("--stopwords", default=None)
    b.add_argument("--grammar", default=None)
    b.add_argument("--rows-per-partition", type=int, default=None)
    b.add_argument("--partitions-per-segment", type=int, default=None)
    b.add_argument("--with-offsets", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("add", help="incremental add (NRT refresh)")
    a.add_argument("--index", required=True)
    a.add_argument("--source", required=True, nargs="+")
    a.set_defaults(fn=cmd_add)

    d = sub.add_parser("delete", help="delete-by-term")
    d.add_argument("--index", required=True)
    d.add_argument("--col", required=True)
    d.add_argument("--values", required=True)
    d.add_argument("--numeric", action="store_true")
    d.set_defaults(fn=cmd_delete)

    c = sub.add_parser("compact", help="segment compaction")
    c.add_argument("--index", required=True)
    c.add_argument("--segments", default=None,
                   help="comma-separated seg ids; omit for tiered auto")
    c.set_defaults(fn=cmd_compact)

    s = sub.add_parser("search", help="classic-syntax query -> JSON rows")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--threshold", type=int, default=1000)
    s.add_argument("--fields", default=None,
                   help="stored columns to return (default: all)")
    s.add_argument("--xml", action="store_true",
                   help="parse --query as XML (CoreParser element set)")
    s.set_defaults(fn=cmd_search)

    sp = sub.add_parser("split", help="split by stored-column predicate")
    sp.add_argument("--index", required=True)
    sp.add_argument("--keep", required=True)
    sp.add_argument("--rest", required=True)
    sp.add_argument("--col", required=True)
    sp.add_argument("--values", required=True)
    sp.add_argument("--no-expunge", action="store_true")
    sp.set_defaults(fn=cmd_split)

    n = sub.add_parser("count", help="exact hit count")
    n.add_argument("--index", required=True)
    n.add_argument("--query", required=True)
    n.set_defaults(fn=cmd_count)

    t = sub.add_parser("stats", help="manifest stats")
    t.add_argument("--index", required=True)
    t.set_defaults(fn=cmd_stats)

    r = sub.add_parser("replicate",
                       help="sync a commit point to a replica dir")
    r.add_argument("--index", required=True, help="primary index dir")
    r.add_argument("--replica", required=True, help="replica dir")
    r.add_argument("--generation", type=int, default=None,
                   help="pinned commit generation (default: latest)")
    r.add_argument("--concurrency", type=int, default=8,
                   help="parallel Ray copy tasks")
    r.add_argument("--keep-unreferenced", action="store_true")
    r.set_defaults(fn=cmd_replicate)

    args = ap.parse_args(argv)
    # single-path source convenience: build/add accept one or many
    if getattr(args, "source", None) is not None and len(args.source) == 1:
        args.source = args.source[0]
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
