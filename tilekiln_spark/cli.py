"""CLI entry points — parity with the reference's click commands
(reference tilekiln/main.py:25-32, scripts/{config,generate,storage}.py),
argparse-based so no extra dependency:

    python -m tilekiln_spark.cli config test --config cfg.yaml
    python -m tilekiln_spark.cli config plan --config cfg.yaml --layer water --zoom 4
    python -m tilekiln_spark.cli generate zooms --config cfg.yaml --store DIR \
        --min-zoom 0 --max-zoom 6 --synth-pages 10000
    python -m tilekiln_spark.cli generate tiles --config cfg.yaml --store DIR < tiles.txt
    python -m tilekiln_spark.cli generate layers --config cfg.yaml --store DIR < tl.txt
    python -m tilekiln_spark.cli storage init|destroy|inspect|delete|tiledelete|layerdelete ...

`generate tiles` reads 'z/x/y' lines on stdin and `generate layers` reads
'z/x/y,layer' lines, exactly like the reference's expiry-list piping
(reference scripts/generate.py:42-86, 157-220).  The serve group hosts the
stdlib HTTP tile server (storage/server.py — reference scripts/serve.py's
static/live/dev commands plus main.py:35-83's prometheus exporter):

    python -m tilekiln_spark.cli serve static --store DIR [--bind-port 8000]
    python -m tilekiln_spark.cli serve live --config cfg.yaml --store DIR ...
    python -m tilekiln_spark.cli serve dev --config cfg.yaml ...
    python -m tilekiln_spark.cli prometheus --store DIR [--bind-port 10013]

Beyond the reference: the corpus group runs the training-data operators
over parquet without writing any Python:

    python -m tilekiln_spark.cli corpus dedup --input in.parquet \
        --output out.parquet [--mode exact|near]
    python -m tilekiln_spark.cli corpus sample --input in.parquet \
        --output out.parquet --fraction 0.3
    python -m tilekiln_spark.cli corpus pipeline --input in.parquet \
        --benchmark bench.parquet [--embeddings emb.parquet]  # funnel JSON
    python -m tilekiln_spark.cli corpus semdedup --input emb.parquet \
        --output kept.parquet        # SemDeDup over the embedding column
    python -m tilekiln_spark.cli corpus probe --train labeled.parquet \
        --input emb.parquet --output scores.parquet   # learned quality filter
    python -m tilekiln_spark.cli corpus dedupagainst --input new.parquet \
        --index corpus.parquet --output admitted.parquet  # incremental ingest
    python -m tilekiln_spark.cli corpus decontam --input in.parquet \
        --benchmark bench.parquet --output clean.parquet [--vec-col embedding]
    python -m tilekiln_spark.cli corpus shard --input in.parquet \
        --output shards/ --n-shards 64   # partitioned, shuffle-ordered output
    (also: urlfilter hostprofile qualityfilter lmscore bpetrain tokenize
     search pagerank)
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("tilekiln_spark_cli")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _load_config(path: str):
    import os

    import yaml

    from tilekiln_spark.config.model import Config

    with open(path) as f:
        raw = f.read()
    # resolve template files relative to the config, like the reference's
    # filesystem loader (reference config.py load_config)
    d = os.path.dirname(os.path.abspath(path))
    doc = yaml.safe_load(raw)
    templates = {}
    for layer in (doc.get("vector_layers") or {}).values():
        for defn in layer.get("sql", []):
            fname = defn.get("file")
            if fname and fname not in templates:
                p = os.path.join(d, fname)
                templates[fname] = open(p).read().strip() if os.path.exists(p) else fname
    return Config(raw, templates)


def _sources(spark, args):
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import layer_polygons, pages

    if getattr(args, "pages_parquet", None):
        pg = spark.read.parquet(args.pages_parquet)
    else:
        pg = pages(spark, args.synth_pages)
    if getattr(args, "polygons_parquet", None):
        polys = spark.read.parquet(args.polygons_parquet)
    else:
        polys = layer_polygons(spark, args.synth_polygons)
    from tilekiln_spark.operators.tiling import sample_tables

    # SQL-template configs resolve their FROM tables here; the default
    # registry exposes the osm2pgsql-style schema over these sources
    return {
        "pages_geo": pages_geo(pg),
        "layer_polygons": polys,
        "tables": sample_tables(),
    }


def _add_source_opts(p):
    p.add_argument("--pages-parquet")
    p.add_argument("--synth-pages", type=int, default=10000)
    p.add_argument("--polygons-parquet")
    p.add_argument("--synth-polygons", type=int, default=40)


def cmd_config_test(args) -> int:
    """reference scripts/config.py test: parse + validate, exit code only."""
    _load_config(args.config)
    print("config ok")
    return 0


def cmd_config_sql(args) -> int:
    """reference scripts/config.py sql: print the PostGIS SQL the reference
    would issue for a tile (one layer, or every defined layer)."""
    from tilekiln_spark.tiles.core import Tile

    cfg = _load_config(args.config)
    tile = Tile(args.zoom, args.x, args.y)
    if args.layer is None:
        for sql in cfg.layer_queries(tile).values():
            if sql is not None:
                print(sql)
        return 0
    try:
        sql = cfg.layer_query(args.layer, tile)
    except KeyError:
        print(f"Layer '{args.layer}' not found in configuration", file=sys.stderr)
        return 1
    if sql is None:
        print(
            f"Zoom {args.zoom} not between min zoom and max zoom for layer {args.layer}.",
            file=sys.stderr,
        )
        return 1
    print(sql)
    return 0


def cmd_config_plan(args) -> int:
    """reference scripts/config.py sql: the reference prints rendered SQL;
    the Spark-native equivalent prints the optimized plan of the layer's
    feature build at the requested zoom."""
    spark = _spark()
    cfg = _load_config(args.config)
    from tilekiln_spark.operators.tiling import _layer_band_features

    feats = _layer_band_features(cfg, args.layer, [args.zoom], _sources(spark, args), None)
    if feats is None:
        print(f"layer {args.layer} has no definition at zoom {args.zoom}")
        return 1
    print(feats._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ))
    return 0


def cmd_generate_zooms(args) -> int:
    from tilekiln_spark.plans.generate import generate_zooms

    spark = _spark()
    cfg = _load_config(args.config)
    ts = generate_zooms(
        spark, cfg, _sources(spark, args), args.store, args.min_zoom, args.max_zoom
    )
    print(f"tileset {ts.id} snapshot {ts.store.current_snapshot()}")
    return 0


def _stdin_lines(spark):
    lines = [ln.strip() for ln in sys.stdin if ln.strip()]
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def cmd_generate_tiles(args) -> int:
    from tilekiln_spark.plans.generate import generate_tiles
    from tilekiln_spark.sources.worklist import tiles_from_lines
    from tilekiln_spark.storage.tileset import Tileset

    spark = _spark()
    cfg = _load_config(args.config)
    ts = Tileset.from_config(spark, args.store, cfg)
    snap = generate_tiles(
        spark, cfg, _sources(spark, args), ts, tiles_from_lines(_stdin_lines(spark))
    )
    print(f"snapshot {snap}")
    return 0


def cmd_generate_layers(args) -> int:
    from tilekiln_spark.plans.generate import generate_layers
    from tilekiln_spark.sources.worklist import tile_layers_from_lines
    from tilekiln_spark.storage.tileset import Tileset

    spark = _spark()
    cfg = _load_config(args.config)
    ts = Tileset.from_config(spark, args.store, cfg)
    snaps = generate_layers(
        spark, cfg, _sources(spark, args), ts, tile_layers_from_lines(_stdin_lines(spark))
    )
    print(f"snapshots {snaps}")
    return 0


def cmd_storage_init(args) -> int:
    from tilekiln_spark.storage.catalog import Catalog

    c = Catalog(_spark(), args.store)
    ts = c.create_tileset(_load_config(args.config))
    print(f"initialized {ts.id}")
    return 0


def cmd_storage_destroy(args) -> int:
    from tilekiln_spark.storage.catalog import Catalog

    Catalog(_spark(), args.store).remove_tileset(args.id)
    print(f"destroyed {args.id}")
    return 0


def cmd_storage_inspect(args) -> int:
    """reference storage.py inspect: tile + per-layer byte sizes/timestamps."""
    from tilekiln_spark.storage.catalog import Catalog

    ts = Catalog(_spark(), args.store).get_tileset(args.id)
    got = ts.get_tile(args.zoom, args.x, args.y)
    if got is None:
        print("tile not found")
        return 1
    generated, layers = got
    print(f"generated: {generated}")
    for name, data in layers.items():
        info = "missing" if data is None else f"{len(data)} bytes"
        print(f"  {name}: {info}")
    return 0


def cmd_storage_delete(args) -> int:
    """reference storage.py delete: truncate zooms (all when none given)."""
    from tilekiln_spark.storage.catalog import Catalog

    ts = Catalog(_spark(), args.store).get_tileset(args.id)
    snap = ts.store.delete_zooms(args.zoom if args.zoom else None)
    print(f"snapshot {snap}")
    return 0


def cmd_storage_tiledelete(args) -> int:
    from tilekiln_spark.sources.worklist import tiles_from_lines
    from tilekiln_spark.storage.catalog import Catalog

    spark = _spark()
    ts = Catalog(spark, args.store).get_tileset(args.id)
    snap = ts.store.delete_tiles(tiles_from_lines(_stdin_lines(spark)))
    print(f"snapshot {snap}")
    return 0


def cmd_storage_layerdelete(args) -> int:
    from tilekiln_spark.sources.worklist import tiles_from_lines
    from tilekiln_spark.storage.catalog import Catalog

    spark = _spark()
    ts = Catalog(spark, args.store).get_tileset(args.id)
    snap = ts.store.delete_layers(tiles_from_lines(_stdin_lines(spark)), [args.layer])
    print(f"snapshot {snap}")
    return 0


def _serve(srv) -> int:
    print(f"serving on {srv.base_url}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_serve_static(args) -> int:
    """reference scripts/serve.py static: stored tiles only."""
    from tilekiln_spark.storage.catalog import Catalog
    from tilekiln_spark.storage.server import TileServer

    return _serve(TileServer(
        "static", catalog=Catalog(_spark(), args.store),
        host=args.bind_host, port=args.bind_port, base_url=args.base_url,
    ))


def cmd_serve_live(args) -> int:
    """reference scripts/serve.py live: read-through fill on storage miss."""
    from tilekiln_spark.storage.catalog import Catalog
    from tilekiln_spark.storage.server import TileServer

    spark = _spark()
    cfg = _load_config(args.config)
    return _serve(TileServer(
        "live", catalog=Catalog(spark, args.store), config=cfg,
        sources=_sources(spark, args),
        host=args.bind_host, port=args.bind_port, base_url=args.base_url,
    ))


def cmd_serve_dev(args) -> int:
    """reference scripts/serve.py dev: render every request, no storage."""
    from tilekiln_spark.storage.server import TileServer

    spark = _spark()
    cfg = _load_config(args.config)
    return _serve(TileServer(
        "dev", config=cfg, sources=_sources(spark, args),
        host=args.bind_host, port=args.bind_port, base_url=args.base_url,
    ))


def cmd_corpus_dedup(args) -> int:
    """corpus dedup: parquet in -> deduplicated parquet out (exact or near)."""
    spark = _spark()
    df = spark.read.parquet(args.input)
    if args.mode == "exact":
        from tilekiln_spark.operators.dedup import exact_dedup

        kept = exact_dedup(df, args.text_col, args.key_col)
    else:
        from pyspark.sql import functions as F

        from tilekiln_spark.operators.dedup import dedup_clusters

        labels = dedup_clusters(
            df, args.text_col, args.key_col, threshold=args.threshold
        )
        ids = labels.filter(F.col("is_canonical") == 1).select(args.key_col)
        kept = df.join(F.broadcast(ids), args.key_col, "left_semi")
    kept.write.mode("overwrite").parquet(args.output)
    print(f"kept {kept.count()} docs -> {args.output}")
    return 0


def cmd_corpus_sample(args) -> int:
    """corpus sample: deterministic md5-keyed fraction sample."""
    from tilekiln_spark.operators.sampling import sample_fraction

    spark = _spark()
    df = spark.read.parquet(args.input)
    out = sample_fraction(df, args.fraction, args.key_col, args.seed)
    out.write.mode("overwrite").parquet(args.output)
    print(f"kept {out.count()} rows -> {args.output}")
    return 0


def cmd_corpus_pipeline(args) -> int:
    """corpus pipeline: full funnel, stats as one JSON line on stdout."""
    import json

    from tilekiln_spark.operators.pipeline import training_corpus_pipeline

    spark = _spark()
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark).select(args.text_col)
    quality = None
    if args.quality:
        quality = {"min_words": args.min_words, "max_words": args.max_words}
    probe = None
    if args.embeddings:
        probe = {
            "embeddings": spark.read.parquet(args.embeddings),
            "label_col": args.probe_label_col,
            "min_prob": args.probe_min_prob,
            "dim": args.probe_dim,
        }
    row = training_corpus_pipeline(
        docs, bench, text_col=args.text_col, key_col=args.key_col,
        fraction=args.fraction, seq_len=args.seq_len, quality=quality,
        lm_min_logprob=args.lm_min_logprob, probe=probe,
    ).collect()[0]
    print(json.dumps(row.asDict()))
    return 0


def cmd_corpus_urlfilter(args) -> int:
    """corpus urlfilter: admission gates + snapshot selection; funnel on
    stdout, surviving rows (newest capture per normalized URL) to parquet."""
    import json

    from pyspark.sql import functions as F

    from tilekiln_spark.operators.webstats import latest_capture, url_filter_flags

    spark = _spark()
    df = spark.read.parquet(args.input)
    flagged = url_filter_flags(
        df, args.url_col,
        host_blocklist=tuple(args.block_host or ()),
        max_depth=args.max_depth,
    )
    funnel = {
        r["gate"]: r["n"]
        for r in flagged.groupBy(
            F.coalesce("drop_reason", F.lit("kept")).alias("gate")
        ).count().withColumnRenamed("count", "n").collect()
    }
    kept = flagged.filter("keep").drop("keep", "drop_reason")
    if args.ts_col:
        kept = latest_capture(kept, args.url_col, args.ts_col)
    kept.write.mode("overwrite").parquet(args.output)
    funnel["written"] = kept.count()
    print(json.dumps(funnel))
    return 0


def cmd_corpus_hostprofile(args) -> int:
    """corpus hostprofile: per-host quality rollup to parquet, worst
    (highest dup-rate) hosts on stdout."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.webstats import host_profile

    spark = _spark()
    prof = host_profile(
        spark.read.parquet(args.input), args.url_col, args.text_col, args.lang_col
    )
    prof.write.mode("overwrite").parquet(args.output)
    for r in prof.orderBy(F.desc("dup_rate"), "host").limit(args.top).collect():
        print(f"{r.host}\t{r.n_pages}\t{r.dup_rate:.3f}")
    return 0


def cmd_corpus_qualityfilter(args) -> int:
    """corpus qualityfilter: Gopher-style doc admission gates; funnel on
    stdout, kept rows to parquet."""
    import json

    from pyspark.sql import functions as F

    from tilekiln_spark.operators.quality import doc_quality_flags

    spark = _spark()
    flagged = doc_quality_flags(
        spark.read.parquet(args.input),
        text_col=args.text_col,
        min_words=args.min_words,
        max_words=args.max_words,
    )
    funnel = {
        r["gate"]: r["n"]
        for r in flagged.groupBy(
            F.coalesce("drop_reason", F.lit("kept")).alias("gate")
        ).count().withColumnRenamed("count", "n").collect()
    }
    kept = flagged.filter("keep").drop("keep", "drop_reason")
    kept.write.mode("overwrite").parquet(args.output)
    print(json.dumps(funnel))
    return 0


def cmd_corpus_lmscore(args) -> int:
    """corpus lmscore: train the pruned bigram LM on the corpus and write
    per-doc stupid-backoff scores; the N most surprising docs on stdout."""
    from pyspark.sql import functions as F

    from tilekiln_spark.functions.lm import lm_doc_scores, train_bigram_lm

    spark = _spark()
    df = spark.read.parquet(args.input)
    lm = train_bigram_lm(
        df, args.text_col, k_vocab=args.k_vocab, m_bigrams=args.m_bigrams
    )
    scores = lm_doc_scores(df, lm, args.text_col, args.id_col)
    scores.write.mode("overwrite").parquet(args.output)
    for r in scores.orderBy(F.asc("avg_logprob")).limit(args.top).collect():
        print(f"{r[args.id_col]}\t{r.n_bigrams}\t{r.avg_logprob:.6f}")
    lm.unpersist()
    return 0


def cmd_corpus_buckets(args) -> int:
    """corpus buckets: CCNet head/middle/tail perplexity terciles per
    language (exact rank rule, or the map-only broadcast-cutoff mode with
    --estimate).  Bucketed table to parquet; per-(lang, bucket) counts on
    stdout."""
    from tilekiln_spark.functions.lm import (
        ccnet_buckets,
        ccnet_cutoffs,
        lm_doc_scores,
        train_bigram_lm,
    )

    spark = _spark()
    df = spark.read.parquet(args.input)
    lm = train_bigram_lm(
        df, args.text_col, k_vocab=args.k_vocab, m_bigrams=args.m_bigrams
    )
    # one persisted scoring pass feeds BOTH the cutoff estimate and the
    # assignment (the scan is the expensive half at corpus scale)
    scores = lm_doc_scores(df, lm, args.text_col, args.id_col).persist()
    cuts = None
    if args.estimate:
        cuts = ccnet_cutoffs(
            df, lm, args.text_col, args.id_col, args.lang_col, scores=scores
        )
    out = ccnet_buckets(
        df, lm, args.text_col, args.id_col, args.lang_col,
        cutoffs=cuts, scores=scores,
    ).persist()
    out.write.mode("overwrite").parquet(args.output)
    counts = (
        out.groupBy("lang", "bucket").count().orderBy("lang", "bucket").collect()
    )
    for r in counts:
        print(f"{r.lang}\t{r.bucket}\t{r['count']}")
    out.unpersist()
    scores.unpersist()
    lm.unpersist()
    return 0


def cmd_corpus_resample(args) -> int:
    """corpus resample: DSIR importance resampling — Gumbel-max top-k draw
    of input docs proportional to their importance weight against the
    target corpus (--target parquet, or --target-where filter on the
    input).  Selected docs to parquet; top rows on stdout."""
    from tilekiln_spark.operators.selection import dsir_resample

    if (args.target is None) == (args.target_where is None):
        print("pass exactly one of --target / --target-where", file=sys.stderr)
        return 2
    spark = _spark()
    df = spark.read.parquet(args.input)
    target = (
        spark.read.parquet(args.target)
        if args.target
        else df.filter(args.target_where)
    )
    out = dsir_resample(
        df, target, k=args.k, text_col=args.text_col,
        key_col=args.id_col, buckets=args.buckets, seed=args.seed,
    ).persist()
    out.write.mode("overwrite").parquet(args.output)
    for r in out.limit(args.top).collect():
        print(f"{r[args.id_col]}\t{r.dsir_logweight:.6f}\t{r.gumbel_key:.6f}")
    out.unpersist()
    return 0


def cmd_corpus_bpetrain(args) -> int:
    """corpus bpetrain: learn BPE merges from the corpus; one merge per
    line on stdout (training order), merge table to parquet."""
    from tilekiln_spark.functions.bpe import bpe_train

    spark = _spark()
    merges = bpe_train(
        spark.read.parquet(args.input),
        num_merges=args.merges,
        text_col=args.text_col,
        v_words=args.v_words,
    )
    out = spark.createDataFrame(
        merges, "step int, x string, y string, n long"
    )
    out.write.mode("overwrite").parquet(args.output)
    for step, x, y, n in merges:
        print(f"{step}\t{x}\t{y}\t{n}")
    return 0


def cmd_corpus_tokenize(args) -> int:
    """corpus tokenize: encode every doc to BPE token ids under a trained
    merge table (corpus bpetrain's parquet); with --seq-len, also write the
    materialized packed training sequences."""
    from tilekiln_spark.functions.bpe import bpe_token_ids

    if args.seq_len and not args.sequences:
        print("error: --seq-len requires --sequences OUT_PATH", file=sys.stderr)
        return 2
    spark = _spark()
    docs = spark.read.parquet(args.input)
    mrows = spark.read.parquet(args.merges).orderBy("step").collect()
    merges = [(r.step, r.x, r.y, r.n) for r in mrows]
    ids = bpe_token_ids(docs, merges, args.text_col, args.key_col)
    ids.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    n_docs = written.count()
    from pyspark.sql import functions as F

    n_tok = written.agg(F.sum("n_tokens")).collect()[0][0] or 0
    print(f"tokenized {n_docs} docs, {n_tok} tokens -> {args.output}")
    if args.seq_len:
        from tilekiln_spark.operators.packing import pack_token_sequences

        seqs = pack_token_sequences(written, args.seq_len, key_col=args.key_col)
        seqs.write.mode("overwrite").parquet(args.sequences)
        n_seq = spark.read.parquet(args.sequences).count()
        print(f"packed {n_seq} sequences of {args.seq_len} -> {args.sequences}")
    return 0


def cmd_corpus_search(args) -> int:
    """corpus search: BM25 top-k over parquet; one tab-separated line per
    hit (doc id, score)."""
    from tilekiln_spark.operators.retrieval import bm25_topk

    spark = _spark()
    hits = bm25_topk(
        spark.read.parquet(args.input), args.terms,
        k=args.top, text_col=args.text_col, id_col=args.id_col,
    )
    for r in hits.collect():
        print(f"{r[args.id_col]}\t{r.score:.6f}")
    return 0


def cmd_corpus_pagerank(args) -> int:
    """corpus pagerank: damped PageRank over a (src, dst) edge parquet;
    full ranks to parquet, top nodes on stdout."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.graph import pagerank

    spark = _spark()
    edges = spark.read.parquet(args.edges)
    if args.nodes:
        nodes = spark.read.parquet(args.nodes).select(
            F.col(spark.read.parquet(args.nodes).columns[0]).alias("node")
        )
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    ranks = pagerank(nodes, edges, iterations=args.iterations, damping=args.damping)
    ranks.write.mode("overwrite").parquet(args.output)
    for r in ranks.orderBy(F.desc("rank"), "node").limit(args.top).collect():
        print(f"{r.node}\t{r.rank:.8f}")
    return 0


def cmd_corpus_semdedup(args) -> int:
    """corpus semdedup: SemDeDup over an embedding parquet — writes the
    kept (canonical) rows; drop counts on stdout."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.similarity import semantic_dedup

    spark = _spark()
    df = spark.read.parquet(args.input)
    labels = semantic_dedup(
        df,
        threshold=args.threshold,
        n_centroids=args.n_centroids,
        vec_col=args.vec_col,
        key_col=args.key_col,
        centroids=args.centroids,
        canonical=args.canonical,
    )
    # broadcast the DROPPED side: canonical docs are the large majority, so
    # a broadcast semi-join on kept ids would blow the broadcast limit at
    # exactly the corpus sizes this operator exists for
    dropped = labels.filter(F.col("is_canonical") == 0).select(args.key_col)
    kept = df.join(F.broadcast(dropped), args.key_col, "left_anti")
    kept.write.mode("overwrite").parquet(args.output)
    n_in = df.count()
    n_out = spark.read.parquet(args.output).count()  # count the artifact, not the DAG
    print(f"kept {n_out}/{n_in} docs ({n_in - n_out} semantic dups) -> {args.output}")
    return 0


def cmd_corpus_probe(args) -> int:
    """corpus probe: train the logistic linear probe on a labelled
    embedding parquet, score another, write (key, prob, pred)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.classifier import (
        linear_probe_scores,
        train_linear_probe,
    )

    spark = _spark()
    train = spark.read.parquet(args.train).select(
        args.vec_col, F.col(args.label_col).cast("double").alias("__y")
    )
    w = train_linear_probe(
        train, vec_col=args.vec_col, label_col="__y",
        dim=args.dim, iters=args.iters, lr=args.lr,
    )
    corpus = spark.read.parquet(args.input)
    scores = linear_probe_scores(
        corpus, w, vec_col=args.vec_col, key_col=args.key_col,
        threshold=args.cut,
    )
    scores.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    n_all = written.count()
    n_keep = written.filter(F.col("pred") == 1).count()
    print(f"scored {n_all} docs, {n_keep} over the {args.cut} cut -> {args.output}")
    return 0


def cmd_corpus_dedupagainst(args) -> int:
    """corpus dedupagainst: admit only the new docs NOT already in the
    index corpus (incremental crawl ingestion)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.dedup import dedup_against

    spark = _spark()
    new = spark.read.parquet(args.input)
    index = spark.read.parquet(args.index)
    verdicts = dedup_against(
        new, index, args.text_col, args.key_col, threshold=args.threshold
    )
    # broadcast the DUP side (the minority in a healthy increment) and
    # anti-join — the admitted majority never fits a broadcast
    dups = verdicts.filter(F.col("is_dup") == 1).select(args.key_col)
    admitted = new.join(F.broadcast(dups), args.key_col, "left_anti")
    admitted.write.mode("overwrite").parquet(args.output)
    n_new = new.count()
    n_ok = spark.read.parquet(args.output).count()
    print(f"admitted {n_ok}/{n_new} new docs ({n_new - n_ok} already indexed) -> {args.output}")
    return 0


def cmd_corpus_decontam(args) -> int:
    """corpus decontam: drop docs leaking the benchmark — lexically
    (shared n-grams) and, when both sides carry embeddings, semantically."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.decontam import (
        decontaminate,
        semantic_contamination,
    )

    spark = _spark()
    corpus = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark)
    lexkept = decontaminate(
        corpus, bench, n=args.ngram, text_col=args.text_col,
        key_col=args.key_col,
    ).persist()
    n_lex = lexkept.count()
    kept = lexkept
    if args.vec_col:
        missing = [
            side
            for side, frame in (("--input", corpus), ("--benchmark", bench))
            if args.vec_col not in frame.columns
        ]
        if missing:
            # an explicitly requested semantic pass must not silently
            # downgrade to lexical-only
            print(
                f"error: --vec-col {args.vec_col} missing from "
                f"{' and '.join(missing)}", file=sys.stderr,
            )
            return 2
        hits = semantic_contamination(
            lexkept,
            # deterministic bench ids (md5 of the embedding bytes): the
            # hit_of audit pointer must survive re-runs at any layout
            bench.select(
                F.md5(F.to_json(F.col(args.vec_col))).alias("bench_id"),
                args.vec_col,
            ),
            threshold=args.cos_threshold,
            vec_col=args.vec_col,
            key_col=args.key_col,
        )
        flagged = hits.filter(F.col("n_hits") > 0).select(args.key_col)
        kept = lexkept.join(F.broadcast(flagged), args.key_col, "left_anti")
    kept.write.mode("overwrite").parquet(args.output)
    lexkept.unpersist()
    n_in = corpus.count()
    n_out = spark.read.parquet(args.output).count()
    print(
        f"kept {n_out}/{n_in} docs ({n_in - n_lex} lexical, "
        f"{n_lex - n_out} semantic leaks) -> {args.output}"
    )
    return 0


def cmd_corpus_shard(args) -> int:
    """corpus shard: write the sharded training corpus (partitionBy(shard),
    md5-shuffle order inside each shard); manifest on stdout."""
    from tilekiln_spark.operators.sampling import write_training_shards

    spark = _spark()
    docs = spark.read.parquet(args.input)
    manifest = write_training_shards(
        docs, args.output, args.n_shards, args.key_col, args.seed
    )
    for r in manifest.collect():
        print(f"shard={r.shard}\t{r.n_docs}")
    return 0


def cmd_storage_diff(args) -> int:
    """storage diff: the incremental publish set between two tile-table
    parquet paths — per-status counts on stdout, full worklist to
    --output when given."""
    from tilekiln_spark.storage.tilestore import tileset_diff

    spark = _spark()
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    keys = tuple(s.strip() for s in args.keys.split(","))
    vals = tuple(
        c for c in new.columns if c not in keys
    ) if args.values is None else tuple(s.strip() for s in args.values.split(","))
    out = tileset_diff(old, new, key_cols=keys, value_cols=vals).persist()
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    for r in out.groupBy("status").count().orderBy("status").collect():
        print(f"{r.status}\t{r['count']}")
    out.unpersist()
    return 0


def cmd_prometheus(args) -> int:
    """reference main.py:35-83: metrics exporter (here the same listener,
    serving only /metrics matters to a scraper)."""
    from tilekiln_spark.storage.catalog import Catalog
    from tilekiln_spark.storage.server import TileServer

    return _serve(TileServer(
        "static", catalog=Catalog(_spark(), args.store),
        host=args.bind_host, port=args.bind_port,
    ))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tilekiln_spark")
    sub = p.add_subparsers(dest="group", required=True)

    cfg = sub.add_parser("config").add_subparsers(dest="cmd", required=True)
    t = cfg.add_parser("test")
    t.add_argument("--config", required=True)
    t.set_defaults(fn=cmd_config_test)
    s = cfg.add_parser("plan")
    s.add_argument("--config", required=True)
    s.add_argument("--layer", required=True)
    s.add_argument("--zoom", type=int, required=True)
    _add_source_opts(s)
    s.set_defaults(fn=cmd_config_plan)
    sq = cfg.add_parser("sql")
    sq.add_argument("--config", required=True)
    sq.add_argument("--layer")
    sq.add_argument("-z", "--zoom", type=int, required=True)
    sq.add_argument("-x", type=int, required=True)
    sq.add_argument("-y", type=int, required=True)
    sq.set_defaults(fn=cmd_config_sql)

    gen = sub.add_parser("generate").add_subparsers(dest="cmd", required=True)
    z = gen.add_parser("zooms")
    z.add_argument("--config", required=True)
    z.add_argument("--store", required=True)
    z.add_argument("--min-zoom", type=int, required=True)
    z.add_argument("--max-zoom", type=int, required=True)
    _add_source_opts(z)
    z.set_defaults(fn=cmd_generate_zooms)
    for name, fn in (("tiles", cmd_generate_tiles), ("layers", cmd_generate_layers)):
        g = gen.add_parser(name)
        g.add_argument("--config", required=True)
        g.add_argument("--store", required=True)
        _add_source_opts(g)
        g.set_defaults(fn=fn)

    st = sub.add_parser("storage").add_subparsers(dest="cmd", required=True)
    i = st.add_parser("init")
    i.add_argument("--config", required=True)
    i.add_argument("--store", required=True)
    i.set_defaults(fn=cmd_storage_init)
    d = st.add_parser("destroy")
    d.add_argument("--store", required=True)
    d.add_argument("--id", required=True)
    d.set_defaults(fn=cmd_storage_destroy)
    ins = st.add_parser("inspect")
    ins.add_argument("--store", required=True)
    ins.add_argument("--id", required=True)
    ins.add_argument("-z", "--zoom", type=int, required=True)
    ins.add_argument("-x", type=int, required=True)
    ins.add_argument("-y", type=int, required=True)
    ins.set_defaults(fn=cmd_storage_inspect)
    dfp = st.add_parser("diff")
    dfp.add_argument("--old", required=True)
    dfp.add_argument("--new", required=True)
    dfp.add_argument("--keys", default="zoom,x,y")
    dfp.add_argument("--values", default=None,
                     help="comma list; default = every non-key column of --new")
    dfp.add_argument("--output", default=None)
    dfp.set_defaults(fn=cmd_storage_diff)
    de = st.add_parser("delete")
    de.add_argument("--store", required=True)
    de.add_argument("--id", required=True)
    de.add_argument("--zoom", type=int, action="append")
    de.set_defaults(fn=cmd_storage_delete)
    td = st.add_parser("tiledelete")
    td.add_argument("--store", required=True)
    td.add_argument("--id", required=True)
    td.set_defaults(fn=cmd_storage_tiledelete)
    ld = st.add_parser("layerdelete")
    ld.add_argument("--store", required=True)
    ld.add_argument("--id", required=True)
    ld.add_argument("--layer", required=True)
    ld.set_defaults(fn=cmd_storage_layerdelete)

    def _add_bind_opts(sp, default_port):
        sp.add_argument("--bind-host", default="127.0.0.1")
        sp.add_argument("--bind-port", type=int, default=default_port)
        sp.add_argument("--base-url")

    sv = sub.add_parser("serve").add_subparsers(dest="cmd", required=True)
    ss = sv.add_parser("static")
    ss.add_argument("--store", required=True)
    _add_bind_opts(ss, 8000)
    ss.set_defaults(fn=cmd_serve_static)
    sl = sv.add_parser("live")
    sl.add_argument("--config", required=True)
    sl.add_argument("--store", required=True)
    _add_bind_opts(sl, 8000)
    _add_source_opts(sl)
    sl.set_defaults(fn=cmd_serve_live)
    sd = sv.add_parser("dev")
    sd.add_argument("--config", required=True)
    _add_bind_opts(sd, 8000)
    _add_source_opts(sd)
    sd.set_defaults(fn=cmd_serve_dev)
    co = sub.add_parser("corpus").add_subparsers(dest="cmd", required=True)

    def _corpus_io(sp):
        sp.add_argument("--input", required=True)
        sp.add_argument("--text-col", default="text")
        sp.add_argument("--key-col", default="doc_id")

    cd = co.add_parser("dedup")
    _corpus_io(cd)
    cd.add_argument("--output", required=True)
    cd.add_argument("--mode", choices=["exact", "near"], default="exact")
    cd.add_argument("--threshold", type=float, default=0.8)
    cd.set_defaults(fn=cmd_corpus_dedup)
    cs = co.add_parser("sample")
    _corpus_io(cs)
    cs.add_argument("--output", required=True)
    cs.add_argument("--fraction", type=float, required=True)
    cs.add_argument("--seed", type=int, default=42)
    cs.set_defaults(fn=cmd_corpus_sample)
    cp = co.add_parser("pipeline")
    _corpus_io(cp)
    cp.add_argument("--benchmark", required=True)
    cp.add_argument("--fraction", type=float, default=0.5)
    cp.add_argument("--seq-len", type=int, default=4096)
    cp.add_argument("--quality", action="store_true",
                    help="run the Gopher admission gates as stage 0")
    cp.add_argument("--min-words", type=int, default=50)
    cp.add_argument("--max-words", type=int, default=100_000)
    cp.add_argument("--lm-min-logprob", type=float, default=None,
                    help="CCNet-style filter: drop docs whose avg "
                         "stupid-backoff logprob is below this")
    cp.add_argument("--embeddings", default=None,
                    help="labelled embedding parquet (keyed by --key-col); "
                         "enables the learned-probe filter stage")
    cp.add_argument("--probe-label-col", default="label")
    cp.add_argument("--probe-min-prob", type=float, default=0.5)
    cp.add_argument("--probe-dim", type=int, default=64)
    cp.set_defaults(fn=cmd_corpus_pipeline)
    cu = co.add_parser("urlfilter")
    cu.add_argument("--input", required=True)
    cu.add_argument("--output", required=True)
    cu.add_argument("--url-col", default="url")
    cu.add_argument("--ts-col", default=None,
                    help="capture timestamp column; keeps newest per normalized URL")
    cu.add_argument("--block-host", action="append", default=[])
    cu.add_argument("--max-depth", type=int, default=8)
    cu.set_defaults(fn=cmd_corpus_urlfilter)
    ch = co.add_parser("hostprofile")
    ch.add_argument("--input", required=True)
    ch.add_argument("--output", required=True)
    ch.add_argument("--url-col", default="url")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--lang-col", default="lang")
    ch.add_argument("--top", type=int, default=20)
    ch.set_defaults(fn=cmd_corpus_hostprofile)
    cq = co.add_parser("qualityfilter")
    cq.add_argument("--input", required=True)
    cq.add_argument("--output", required=True)
    cq.add_argument("--text-col", default="text")
    cq.add_argument("--min-words", type=int, default=50)
    cq.add_argument("--max-words", type=int, default=100_000)
    cq.set_defaults(fn=cmd_corpus_qualityfilter)
    cl = co.add_parser("lmscore")
    cl.add_argument("--input", required=True)
    cl.add_argument("--output", required=True)
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--k-vocab", type=int, default=50_000)
    cl.add_argument("--m-bigrams", type=int, default=200_000)
    cl.add_argument("--top", type=int, default=20)
    cl.set_defaults(fn=cmd_corpus_lmscore)
    cbk = co.add_parser("buckets")
    cbk.add_argument("--input", required=True)
    cbk.add_argument("--output", required=True)
    cbk.add_argument("--text-col", default="text")
    cbk.add_argument("--id-col", default="doc_id")
    cbk.add_argument("--lang-col", default=None)
    cbk.add_argument("--k-vocab", type=int, default=50_000)
    cbk.add_argument("--m-bigrams", type=int, default=200_000)
    cbk.add_argument("--estimate", action="store_true",
                     help="approx_percentile cutoffs + map-only assignment")
    cbk.set_defaults(fn=cmd_corpus_buckets)
    crs = co.add_parser("resample")
    crs.add_argument("--input", required=True)
    crs.add_argument("--output", required=True)
    crs.add_argument("--target", default=None)
    crs.add_argument("--target-where", default=None)
    crs.add_argument("--k", type=int, required=True)
    crs.add_argument("--text-col", default="text")
    crs.add_argument("--id-col", default="doc_id")
    crs.add_argument("--buckets", type=int, default=8192)
    crs.add_argument("--seed", type=int, default=42)
    crs.add_argument("--top", type=int, default=20)
    crs.set_defaults(fn=cmd_corpus_resample)
    cb = co.add_parser("bpetrain")
    cb.add_argument("--input", required=True)
    cb.add_argument("--output", required=True)
    cb.add_argument("--text-col", default="text")
    cb.add_argument("--merges", type=int, default=32)
    cb.add_argument("--v-words", type=int, default=100_000)
    cb.set_defaults(fn=cmd_corpus_bpetrain)
    cs = co.add_parser("search")
    cs.add_argument("--input", required=True)
    cs.add_argument("--terms", nargs="+", required=True)
    cs.add_argument("--text-col", default="text")
    cs.add_argument("--id-col", default="doc_id")
    cs.add_argument("--top", type=int, default=10)
    cs.set_defaults(fn=cmd_corpus_search)
    cg = co.add_parser("pagerank")
    cg.add_argument("--edges", required=True,
                    help="parquet of (src, dst) directed edges")
    cg.add_argument("--nodes", default=None,
                    help="parquet with a node column; defaults to the "
                         "distinct endpoints of --edges")
    cg.add_argument("--output", required=True)
    cg.add_argument("--iterations", type=int, default=8)
    cg.add_argument("--damping", type=float, default=0.85)
    cg.add_argument("--top", type=int, default=20)
    cg.set_defaults(fn=cmd_corpus_pagerank)
    cm = co.add_parser("semdedup")
    cm.add_argument("--input", required=True)
    cm.add_argument("--output", required=True)
    cm.add_argument("--vec-col", default="embedding")
    cm.add_argument("--key-col", default="vec_id")
    cm.add_argument("--threshold", type=float, default=0.9)
    cm.add_argument("--n-centroids", type=int, default=8)
    cm.add_argument("--centroids", choices=["minkey", "kmeans"], default="kmeans")
    cm.add_argument("--canonical", choices=["minkey", "centroid_far"],
                    default="centroid_far",
                    help="exemplar rule: paper's farthest-from-centroid "
                         "(default) or the min key")
    cm.set_defaults(fn=cmd_corpus_semdedup)
    cb = co.add_parser("probe")
    cb.add_argument("--train", required=True,
                    help="labelled embedding parquet to fit the probe on")
    cb.add_argument("--input", required=True)
    cb.add_argument("--output", required=True)
    cb.add_argument("--vec-col", default="embedding")
    cb.add_argument("--key-col", default="vec_id")
    cb.add_argument("--label-col", default="label")
    cb.add_argument("--dim", type=int, default=64)
    cb.add_argument("--iters", type=int, default=3)
    cb.add_argument("--lr", type=float, default=1.0)
    cb.add_argument("--cut", type=float, default=0.5)
    cb.set_defaults(fn=cmd_corpus_probe)
    ca = co.add_parser("dedupagainst")
    _corpus_io(ca)
    ca.add_argument("--index", required=True,
                    help="parquet of the already-deduplicated corpus")
    ca.add_argument("--output", required=True)
    ca.add_argument("--threshold", type=float, default=0.8)
    ca.set_defaults(fn=cmd_corpus_dedupagainst)
    cdx = co.add_parser("decontam")
    _corpus_io(cdx)
    cdx.add_argument("--benchmark", required=True)
    cdx.add_argument("--output", required=True)
    cdx.add_argument("--ngram", type=int, default=8)
    cdx.add_argument("--vec-col", default=None,
                     help="embedding column present on BOTH sides enables "
                          "the semantic pass")
    cdx.add_argument("--cos-threshold", type=float, default=0.95)
    cdx.set_defaults(fn=cmd_corpus_decontam)
    csh = co.add_parser("shard")
    csh.add_argument("--input", required=True)
    csh.add_argument("--output", required=True)
    csh.add_argument("--n-shards", type=int, required=True)
    csh.add_argument("--key-col", default="doc_id")
    csh.add_argument("--seed", type=int, default=42)
    csh.set_defaults(fn=cmd_corpus_shard)
    ctk = co.add_parser("tokenize")
    _corpus_io(ctk)
    ctk.add_argument("--merges", required=True,
                     help="merge-table parquet from `corpus bpetrain`")
    ctk.add_argument("--output", required=True,
                     help="per-doc (key, token_ids, n_tokens) parquet")
    ctk.add_argument("--seq-len", type=int, default=None,
                     help="also materialize packed training sequences")
    ctk.add_argument("--sequences", default=None,
                     help="output path for the packed sequences")
    ctk.set_defaults(fn=cmd_corpus_tokenize)
    pm = sub.add_parser("prometheus")
    pm.add_argument("--store", required=True)
    pm.add_argument("--bind-host", default="0.0.0.0")
    pm.add_argument("--bind-port", type=int, default=10013)
    pm.set_defaults(fn=cmd_prometheus)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
