"""One-command training-data pipeline driver — full rebuild (with
stage checkpoint/resume) and the nightly DELTA twin.

The reference engine's steady state is a continuous loop
(reference scraper.py:1491-1524 — fetch, process, export, repeat); a
batch engine's steady state is the nightly incremental run. Round 9
shipped the full-rebuild composition (`pipeline` subcommand); this
module is its operable form (VERDICT r9 §next-1/2):

* :func:`run_full` — the bootstrap: decontaminate → quality classifier
  → DSIR selection → curate (+state) → SemDeDup (+state) → sliding-
  window split → per-split pack → hash-sharded export. Every stage
  writes its artifact THEN a `_stages/<name>.json` marker holding a
  params CHAIN HASH (this stage's params folded over all upstream
  stages'); ``--resume`` skips a stage iff its marker's chain matches,
  so a crash at stage 6 of 7 re-reads five artifacts instead of
  recomputing them, and a changed upstream flag mismatches every
  downstream chain automatically — those stages recompute, loudly.
  Stages are content-deterministic (seeded), which is what makes
  marker-matching sufficient: equal params + equal inputs ⇒ equal
  artifact.

* :func:`run_delta` — the nightly operation: a NEW crawl slice folds
  into the bootstrap's outputs at delta cost. Composition of the
  exactness-contracted delta operators:
  :func:`~dexscraper_spark.plans.curation.curate_delta` (gates + exact
  + near-dup against the fingerprint store),
  :func:`~dexscraper_spark.operators.dedup.semantic_dedup_delta`
  (SemDeDup fold with retraction-driven resurrection), partition-level
  corpus merge (:func:`~dexscraper_spark.plans.curation.
  merge_partitioned`), shard append/retract (:func:`~dexscraper_spark.
  plans.curation.update_training_shards`), a delta-local pack, and an
  optional :func:`~dexscraper_spark.operators.quantize.
  ivf_pq_extend_saved`. Provided ids are monotone (append-only ingest —
  both delta operators check), bootstrap + N deltas reproduce the
  full rebuild ROW-FOR-ROW on the corpus, both state stores, the
  shards, and the manifest (pytest pins it; the packed/ assignment is
  intentionally delta-local — chunk boundaries depend on global stream
  order, and re-packing the corpus nightly would defeat the delta).
  The curation leg of that equivalence is unconditional; the SEMANTIC
  leg inherits SemDeDup's standing co-blocking proviso, which for
  N ≥ 2 folds bites slightly harder: each intermediate fold clusters
  over its intermediate corpus, so a near-dup pair sitting ON a
  k-means boundary can be co-blocked in one run and split in another
  (geometrically tight duplicate groups are assignment-stable and
  exact round after round — the pinned N=2 test uses exactly-repeated
  vectors for that reason; treat boundary-straddling semantic pairs as
  approximate-recall, same as the paper).

Crash story of a delta run: every corpus/shard edit is idempotent on
replay (partition merges recompute from unchanged inputs and
converge), and the STATE publish — the only step that changes what a
rerun would compute — happens LAST, as one reader-atomic version-
pointer flip (:mod:`dexscraper_spark.fsio`) covering BOTH stores at
once, stamped with the batch id. A rerun after a crash before the
flip recomputes identical edits and converges; after the flip, the
pointer's batch id short-circuits the rerun into a no-op.
"""

from __future__ import annotations

import hashlib
import json
import sys

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dexscraper_spark import fsio
from dexscraper_spark.persist import tracked_persist


class PipelineArgError(ValueError):
    """Bad flags/inputs — the CLI turns this into rc=2 + stderr."""


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _chain(prev: str, params: dict) -> str:
    return hashlib.sha256((prev + _canon(params)).encode()).hexdigest()


class _Stages:
    """Marker-gated stage runner for the FULL pipeline.

    A stage = (name, params, compute). ``compute()`` writes the
    stage's artifacts and returns its summary fragment; the marker
    (artifacts first, marker last — a crash mid-stage leaves no marker
    and the stage reruns) records the summary and the chain hash. On
    ``--resume`` a matching marker returns the recorded summary
    without touching Spark; a PRESENT-but-mismatched marker means a
    flag changed somewhere upstream — recompute, loudly.
    """

    def __init__(self, spark, out: str, *, resume: bool,
                 root_params: dict):
        self.spark = spark
        self.out = out
        self.resume = resume
        self.chain = _chain("", root_params)

    def _marker(self, name: str) -> str:
        return fsio.join(self.out, "_stages", f"{name}.json")

    def run(self, name: str, params: dict, compute) -> dict:
        self.chain = _chain(self.chain, {"stage": name, **params})
        mp = self._marker(name)
        if self.resume and fsio.exists(self.spark, mp):
            try:
                doc = json.loads(fsio.read_text(self.spark, mp))
            except (OSError, ValueError):
                doc = {}
            if doc.get("chain") == self.chain:
                print(f"pipeline: stage {name} already complete — "
                      "skipped (--resume)", file=sys.stderr)
                return doc.get("summary", {})
            print(f"pipeline: stage {name} marker is STALE (a flag "
                  "changed here or upstream) — recomputing it and "
                  "every downstream stage", file=sys.stderr)
        summary = compute()
        fsio.mkdirs(self.spark, fsio.join(self.out, "_stages"))
        fsio.write_text_atomic(self.spark, mp, json.dumps(
            {"stage": name, "chain": self.chain, "summary": summary}))
        return summary


def _check_doc_id(docs: DataFrame) -> None:
    import pyspark.sql.types as T
    if "doc_id" not in docs.columns or not isinstance(
            docs.schema["doc_id"].dataType,
            (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        raise PipelineArgError(
            "--docs needs an integral doc_id column (the composite "
            "piece id is doc_id*2^20 + window_id) — re-id or cast the "
            "corpus first")


def _pieces_of(curated: DataFrame, *, split_max: int,
               stride: int | None) -> DataFrame:
    """One row per trainable piece with the composite piece_id —
    shared verbatim by the bootstrap and the delta so their shard
    contents can be row-for-row comparable."""
    from dexscraper_spark.operators.packing import split_documents

    if split_max and split_max > 0:
        pieces = (split_documents(curated, max_tokens=split_max,
                                  stride=stride)
                  .join(curated.select("doc_id", "split", "lang"),
                        "doc_id")
                  .select("doc_id", "window_id",
                          F.col("window_text").alias("text"),
                          F.col("n_window_tokens").alias("n_tokens"),
                          "split", "lang"))
    else:
        pieces = curated.select(
            "doc_id", F.lit(0).alias("window_id"), "text",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "split", "lang")
    return pieces.withColumn(
        "piece_id", (F.col("doc_id") * F.lit(1 << 20)
                     + F.col("window_id")).cast("long"))


def _budget_check(stats) -> None:
    if stats["n"] and (stats["max_w"] >= (1 << 20)
                       or stats["max_d"] >= (1 << 43)):
        raise PipelineArgError(
            "doc_id/window_id exceed the composite-id budget "
            "(doc_id < 2^43, window_id < 2^20) — re-id the corpus")


def _pack_per_split(pieces: DataFrame, *, mode: str, max_tokens: int,
                    num_shards: int) -> DataFrame:
    """Per-split packing (a shared stream would pack eval text into
    training sequences); (split, chunk_id/bin_id) is the unique key."""
    from dexscraper_spark.operators.packing import (chunk_token_stream,
                                                    pack_greedy)

    parts = []
    for sp in ("train", "valid", "test"):
        sizes = pieces.filter(F.col("split") == sp) \
            .select("piece_id", "n_tokens")
        if mode == "chunk":
            pk = chunk_token_stream(sizes, id_col="piece_id",
                                    max_tokens=max_tokens)
        else:
            pk = pack_greedy(sizes, id_col="piece_id",
                             max_tokens=max_tokens,
                             num_shards=num_shards)
        parts.append(pk.withColumn("split", F.lit(sp)))
    packed = parts[0]
    for pk in parts[1:]:
        packed = packed.unionByName(pk)
    return packed


def _pack_stats(packed: DataFrame, mode: str) -> dict:
    group = ["split", "chunk_id"] if mode == "chunk" \
        else ["split", "bin_id"]
    fill = (F.sum(F.col("tok_end") - F.col("tok_start"))
            if mode == "chunk"
            else F.sum(F.when(~F.col("oversize"),
                              F.col("n_tokens")).otherwise(0)))
    st = (packed.groupBy(*group).agg(fill.alias("f"))
          .agg(F.count(F.lit(1)).alias("units"),
               F.avg("f").alias("avg_fill")).first())
    return {"pack_mode": mode, "pack_units": st["units"],
            "avg_fill": round(float(st["avg_fill"] or 0.0), 2)}


# ---------------------------------------------------------------------------
# Full pipeline (bootstrap)
# ---------------------------------------------------------------------------


def run_full(spark, args) -> dict:
    """The full-rebuild pipeline with per-stage markers + ``--resume``.
    Returns the summary dict (the CLI prints it as one JSON line)."""
    from dexscraper_spark.plans.curation import (
        CurationConfig, curate_corpus_with_state, write_curated,
        write_curation_state, write_training_shards)

    mode = args.mode or "chunk"
    if mode not in ("chunk", "bins"):
        raise PipelineArgError("--mode must be chunk or bins")
    if getattr(args, "upsert", False):
        raise PipelineArgError(
            "--upsert is a --delta mode (a full run re-ingests "
            "everything anyway)")
    split_max = args.split_max_tokens
    if split_max is None:
        split_max = args.max_tokens
    out = args.out
    resume = bool(getattr(args, "resume", False))
    stages = _Stages(spark, out, resume=resume,
                     root_params={"docs": args.docs})

    docs = spark.read.parquet(args.docs)
    _check_doc_id(docs)
    summary: dict = {"mode": "pipeline"}

    # ---- stage pre: decontaminate + quality classifier + DSIR -------
    pre_params = {k: getattr(args, k, None) for k in (
        "eval_docs", "quality_model", "quality_alpha", "target_docs",
        "n", "lm_order", "temperature", "seed")}
    pre_dst = fsio.join(out, "_stages", "pre_docs")
    has_pre = bool(args.eval_docs or args.quality_model
                   or args.target_docs)

    def _pre() -> dict:
        frag: dict = {"input_docs": docs.count()}
        cur = docs
        if args.eval_docs:
            from dexscraper_spark.operators.decontaminate import (
                decontaminate)
            cur, removed = decontaminate(
                cur, spark.read.parquet(args.eval_docs))
            removed = tracked_persist(removed)
            frag["contaminated"] = removed.count()
            removed.write.mode("overwrite").parquet(
                fsio.join(out, "contaminated"))
        if args.quality_model:
            from dexscraper_spark.operators.classifier import (qc_filter,
                                                               qc_load)
            cur = tracked_persist(cur)
            n_in = cur.count()
            qcm = qc_load(spark, args.quality_model)
            cur = tracked_persist(
                qc_filter(cur, qcm, alpha=args.quality_alpha)
                .drop("prob"))
            frag["quality_dropped"] = n_in - cur.count()
        if args.target_docs:
            if not args.n or args.n < 1:
                raise PipelineArgError(
                    "--target-docs needs --n (positive sample size)")
            from dexscraper_spark.operators.lm import lm_train
            from dexscraper_spark.operators.sampling import (
                importance_resample)
            cur = tracked_persist(cur)
            target_docs = spark.read.parquet(args.target_docs)
            target_lm = lm_train(target_docs.select("text"),
                                 n=args.lm_order)
            raw_lm = lm_train(cur.select("text"), n=args.lm_order)
            cur = tracked_persist(importance_resample(
                cur, target_lm, raw_lm, n=args.n,
                lm_order=args.lm_order, seed=args.seed,
                temperature=args.temperature).drop("logw"))
            frag["selected"] = cur.count()
        if has_pre:
            # materialize the processed pool so --resume re-reads it
            # instead of re-running the classifiers; with no pre flags
            # downstream reads the input path directly (no extra copy
            # of a 100 TB corpus)
            cur.write.mode("overwrite").parquet(pre_dst)
            frag["src"] = pre_dst
        else:
            frag["src"] = args.docs
        return frag

    frag = stages.run("pre", pre_params, _pre)
    summary.update({k: v for k, v in frag.items() if k != "src"})
    src = frag["src"]

    # ---- stage curate: gates + exact + near-dup + split -------------
    cur_params = {"min_quality": args.min_quality,
                  "min_tokens": args.min_tokens,
                  "fingerprint_bits": args.fingerprint_bits}
    curated0_dst = fsio.join(out, "_stages", "curated0")

    def _curate() -> dict:
        # a fresh bootstrap (or a flag-invalidated recompute) makes any
        # previous DELTA history stale: drop the versioned state
        # pointer and the batch markers so resolve_pipeline_state falls
        # back to the flat stores this run writes, and an old batch id
        # can never no-op a future fold against the new corpus
        fsio.delete(spark, fsio.join(out, _STATE_ROOT))
        fsio.delete(spark, fsio.join(out, "_delta"))
        cfg = CurationConfig(min_quality=args.min_quality,
                             min_tokens=args.min_tokens,
                             fingerprint_bits=args.fingerprint_bits)
        pool = spark.read.parquet(src)
        curated, state = curate_corpus_with_state(pool, config=cfg)
        curated = tracked_persist(curated)
        n = curated.count()
        write_curation_state(state, fsio.join(out, "state"))
        curated.write.mode("overwrite").parquet(curated0_dst)
        # retained-loser store: every gated doc that lost a dedup
        # stage keeps its full gated row, so a later --upsert can
        # PROMOTE the new min-id survivor instead of refusing (and an
        # exact-dup loser — which has no state row at all — can
        # re-surface when its keeper's content changes). One extra
        # gate pass over the pool; the anti-join is id-only.
        from dexscraper_spark.plans.curation import _gate
        gated = _gate(pool, "doc_id", "text", cfg)
        (_dropped_with_range(
            gated.join(curated.select("doc_id"), "doc_id",
                       "left_anti"))
         .write.mode("overwrite").partitionBy("id_range")
         .parquet(fsio.join(out, _DROPPED_SUB)))
        return {"curated": n}

    summary.update(stages.run("curate", cur_params, _curate))

    # ---- stage semantic: SemDeDup over the curated survivors --------
    sem_params = {"embeddings": args.embeddings,
                  "semantic_threshold": args.semantic_threshold,
                  "semantic_nlist": args.semantic_nlist,
                  "assign_n": args.assign_n,
                  "max_cluster": getattr(args, "max_cluster", None)}

    def _semantic() -> dict:
        # recomputing this stage (without curate) also stales delta
        # history — the semantic state the pointer versions descend
        # from is being replaced
        fsio.delete(spark, fsio.join(out, _STATE_ROOT))
        fsio.delete(spark, fsio.join(out, "_delta"))
        curated = spark.read.parquet(curated0_dst)
        frag: dict = {}
        if args.embeddings:
            from dexscraper_spark.operators.dedup import (
                semantic_dedup_with_state)
            emb = spark.read.parquet(args.embeddings)
            if "doc_id" not in emb.columns and "vec_id" in emb.columns:
                emb = emb.withColumnRenamed("vec_id", "doc_id")
            emb_cur = emb.select("doc_id", "embedding").join(
                curated.select("doc_id"), "doc_id", "left_semi")
            kept_emb, sem_state = semantic_dedup_with_state(
                emb_cur, id_col="doc_id", nlist=args.semantic_nlist,
                threshold=args.semantic_threshold,
                assign_n=args.assign_n,
                max_cluster=getattr(args, "max_cluster", None))
            dropped = emb_cur.select("doc_id").join(
                kept_emb.select("doc_id"), "doc_id", "left_anti")
            dropped = tracked_persist(dropped)
            survivors = tracked_persist(
                curated.join(dropped, "doc_id", "left_anti"))
            n_after = survivors.count()
            frag["semantic_dropped"] = \
                curated.count() - n_after
            frag["curated"] = n_after
            # sem-state + the DROPPED DOCS' full rows: the delta twin
            # needs both — a retraction can RESURRECT a dropped doc,
            # and its text only lives here (losers keep their place in
            # the search universe through sem_state's embeddings)
            sem_state.write.mode("overwrite").parquet(
                fsio.join(out, "sem_state"))
            (curated.join(dropped, "doc_id", "left_semi")
             .write.mode("overwrite").partitionBy("split", "lang")
             .parquet(fsio.join(out, "sem_dropped")))
            write_curated(survivors, fsio.join(out, "curated"))
        else:
            write_curated(curated, fsio.join(out, "curated"))
        return frag

    summary.update(stages.run("semantic", sem_params, _semantic))

    # ---- stage pieces: sliding-window split --------------------------
    pieces_dst = fsio.join(out, "_stages", "pieces")

    def _pieces() -> dict:
        curated = spark.read.parquet(fsio.join(out, "curated"))
        pieces = tracked_persist(_pieces_of(
            curated, split_max=split_max, stride=args.stride))
        st = pieces.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("window_id").alias("max_w"),
            F.max("doc_id").alias("max_d"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tok")).first()
        _budget_check(st)
        pieces.write.mode("overwrite").parquet(pieces_dst)
        return {"pieces": st["n"], "total_tokens": int(st["tok"])}

    summary.update(stages.run(
        "pieces", {"split_max_tokens": split_max,
                   "stride": args.stride}, _pieces))

    # ---- stage pack ---------------------------------------------------
    def _pack() -> dict:
        pieces = spark.read.parquet(pieces_dst)
        packed = tracked_persist(_pack_per_split(
            pieces, mode=mode, max_tokens=args.max_tokens,
            num_shards=args.num_shards))
        packed.write.mode("overwrite").parquet(fsio.join(out, "packed"))
        return _pack_stats(packed, mode)

    summary.update(stages.run(
        "pack", {"mode": mode, "max_tokens": args.max_tokens,
                 "num_shards": args.num_shards}, _pack))

    # ---- stage shards ---------------------------------------------------
    def _shards() -> dict:
        pieces = spark.read.parquet(pieces_dst)
        manifest = write_training_shards(
            pieces.select("piece_id", "doc_id", "window_id", "text",
                          "n_tokens", "split", "lang"),
            fsio.join(out, "shards"), n_shards=args.train_shards,
            id_col="piece_id", token_col="n_tokens")
        return {"shards": manifest["n_shards"],
                "shard_docs": manifest["total_docs"]}

    summary.update(stages.run(
        "shards", {"train_shards": args.train_shards}, _shards))

    # record the delta-relevant knobs (effective values, post-resume /
    # flag-invalidation) so a later --delta can refuse a mismatched fold
    fsio.write_text_atomic(spark, fsio.join(out, "_knobs.json"),
                           json.dumps(_delta_knobs(args, split_max)))
    fsio.write_text_atomic(spark, fsio.join(out, "_run_summary.json"),
                           json.dumps(summary))
    return summary


# ---------------------------------------------------------------------------
# Delta pipeline (nightly)
# ---------------------------------------------------------------------------

_STATE_ROOT = "state_versions"

# Bucketed layered state store (VERDICT r10 §missing-4): hash-bucket
# count for the fingerprint store's partition column, and the target
# bound on how many version directories the bucket-owner manifest may
# span. The bound is held by TRICKLE compaction (VERDICT r11 §next-3):
# every fold rewrites up to ceil(B/(MAX-1)) buckets — the ones whose
# owner lists reach back to the OLDEST versions — collapsing their
# lists to [version]. Each bucket is therefore reset at least every
# MAX-1 folds, so no owner list spans more than MAX versions and no
# fold EVER writes the full store (the r11 design rewrote ALL buckets
# on the fold that crossed the bound — an amortized corpus-linear
# term and a latency cliff on the unlucky night; the trickle pays
# ~the same amortized bytes as a steady per-fold slice instead).
# versions_referenced can transiently reach MAX+1 during the store's
# first compaction cycle (buckets start synchronized on the seed
# version); steady state is ≤ MAX. 64 buckets keeps a small-delta
# fold's write to k≪64 bucket partitions while bounding file counts;
# at 10^11 docs raise --state-buckets so one bucket's rewrite stays
# executor-sized.
_STATE_BUCKETS_DEFAULT = 64      # legacy floor; see derivation below
_STATE_MAX_VERSIONS = 6

# When --state-buckets is not given, the FIRST fold derives the count
# from the store's own size (VERDICT r11 §next-5): ceil(rows / target)
# clamped to [MIN, MAX]. Each store derives from ITS full frame, so
# the wide embeddings store gets proportionally as many buckets as
# the 32-40 B/row fingerprint store without a byte-width model. The
# count is frozen into the layout manifest; later folds inherit it
# and refuse a mismatched explicit flag.
_STATE_ROWS_PER_BUCKET = 100_000
_STATE_BUCKETS_MIN = 16
_STATE_BUCKETS_MAX = 4096


def _vnum(name: str) -> int:
    """Numeric part of a ``v_000123`` version-directory name."""
    return int(name[2:])


def _compact_budget(n_buckets: int) -> int:
    """Per-fold trickle-compaction budget: enough buckets that a full
    rotation completes within _STATE_MAX_VERSIONS - 1 folds."""
    return max(1, -(-n_buckets // (_STATE_MAX_VERSIONS - 1)))

# Knobs a delta fold MUST share with the bootstrap for the
# bootstrap+deltas ≡ full-rebuild contract to hold: the state stores
# hold fingerprints/components computed under these values
# (min_quality..assign_n), and pieces for new docs must split the way
# the rebuild would (split_max_tokens/stride). Pack/shard-count knobs
# are delta-local and excluded.
_DELTA_KNOBS = ("min_quality", "min_tokens", "fingerprint_bits",
                "semantic_threshold", "semantic_nlist", "assign_n",
                "stride")


def _delta_knobs(args, split_max) -> dict:
    d = {k: getattr(args, k, None) for k in _DELTA_KNOBS}
    d["split_max_tokens"] = split_max
    d["semantic"] = bool(args.embeddings)
    return d


def resolve_pipeline_state(spark, out: str) -> tuple:
    """(curation_state_path, semantic_state_path_or_None): from the
    ``state_versions`` pointer when a delta has published, else the
    bootstrap's flat ``state``/``sem_state`` dirs.

    PATH-shaped and therefore only valid for layouts where one
    directory holds the whole store. Under the BUCKETED layered layout
    (r11: the current version owns only the buckets its fold touched,
    older versions own the rest) no single path exists — use
    :func:`read_pipeline_state`; this resolver raises loudly rather
    than hand back a directory holding a fraction of the store."""
    root = fsio.join(out, _STATE_ROOT)
    name = fsio.pointer_read(spark, root)
    if name is not None:
        meta = json.loads(fsio.read_text(
            spark, fsio.join(root, "_current")))
        if meta.get("state_layout") is not None:
            raise ValueError(
                f"{root} is a BUCKETED layered state store — the "
                "current version directory holds only its fold's "
                "touched buckets; read it with read_pipeline_state")
        vdir = fsio.join(root, name)
        sem = fsio.join(vdir, "semantic")
        return (fsio.join(vdir, "curation"),
                sem if fsio.exists(spark, sem) else None)
    legacy = fsio.join(out, "state")
    sem = fsio.join(out, "sem_state")
    return legacy, sem if fsio.exists(spark, sem) else None


def _layered_write(spark, state_root: str, version: str, sub: str, *,
                   full_df: DataFrame, appended_df: DataFrame,
                   changed_ids: DataFrame | None,
                   prev_layout: dict | None,
                   default_buckets: int | None,
                   id_col: str = "doc_id") -> tuple:
    """One layered store's slice for ``version``, written under
    ``<state_root>/<version>/<sub>``; returns ``(layout_doc, stats)``.

    Merge-on-read semantics (see run_delta's publish comment):
    ``appended_df`` rows land delta-sized and their buckets' owner
    lists grow; buckets holding ``changed_ids`` are rewritten wholly
    from ``full_df`` (owner list resets); no previous layout triggers
    the one-time seeding full write. On every later fold a bounded
    TRICKLE of additional buckets — the ones referencing the oldest
    versions, up to :func:`_compact_budget` per fold; only relabel
    rewrites that themselves reset an old-reaching list count against
    the budget (a relabel of a fresh bucket is rotation-neutral) — is
    compacted the same way, which keeps the manifest's version span
    ≤ _STATE_MAX_VERSIONS (+1 transiently in the first cycle) without
    any fold ever rewriting the whole store (VERDICT r11 §next-3): a
    relabel storm cannot starve the rotation, and a hard backstop
    force-compacts any bucket whose list falls behind the MAX-version
    window regardless of budget. Buckets whose owner lists only reach
    back to the previous version are never trickled — a quiet,
    already-compact store is not churned."""
    if prev_layout:
        n_buckets = int(prev_layout["buckets"])
    elif default_buckets:
        n_buckets = int(default_buckets)
    else:
        # size-derived default at seed time: one extra count over the
        # frame that is about to be fully written anyway
        n_rows = full_df.count()
        n_buckets = min(_STATE_BUCKETS_MAX,
                        max(_STATE_BUCKETS_MIN,
                            -(-n_rows // _STATE_ROWS_PER_BUCKET)))
    bucket_col = F.pmod(F.xxhash64(F.col(id_col)),
                        F.lit(n_buckets)).cast("int")
    dst = fsio.join(state_root, version, sub)

    compact = prev_layout is None
    if not compact:
        owners = {int(k): list(v) for k, v in
                  prev_layout["bucket_owners"].items()}
        if changed_ids is not None:
            rewrite = sorted({int(r["b"]) for r in changed_ids
                              .select(bucket_col.alias("b"))
                              .distinct().collect()})
        else:
            rewrite = []
        append = sorted(
            {int(r["b"]) for r in appended_df
             .select(bucket_col.alias("b")).distinct().collect()}
            - set(rewrite))
        # trickle compaction: rewrite up to budget additional buckets,
        # oldest-referencing first (min owner version asc, then list
        # length desc, then bucket id — deterministic). Buckets whose
        # list reaches no further back than the PREVIOUS version are
        # skipped: compacting them would churn a quiet store for no
        # span reduction.
        cur_v = _vnum(version)
        # relabel rewrites count against the trickle budget ONLY when
        # they themselves advance the rotation (reset a list reaching
        # back ≥2 versions). A relabel of an already-fresh bucket is
        # rotation-neutral, and deducting it would let sustained
        # relabel-heavy folds starve the rotation entirely — the
        # quiet buckets' lists (and the version span) then grow until
        # the overdue backstop fires a near-full rewrite.
        rotating = [b for b in rewrite
                    if b in owners
                    and min(_vnum(v) for v in owners[b]) <= cur_v - 2]
        budget = max(0, _compact_budget(n_buckets) - len(rotating))
        cand = sorted(
            (b for b, vs in owners.items()
             if b not in set(rewrite)
             and min(_vnum(v) for v in vs) <= cur_v - 2),
            key=lambda b: (min(_vnum(v) for v in owners[b]),
                           -len(owners[b]), b))
        trickle = cand[:budget]
        # hard span backstop: relabel-heavy folds can consume the
        # whole budget on buckets that were already fresh, starving
        # the rotation — without this, owner lists of quiet buckets
        # grow without bound (and with them versions_referenced, GC
        # retention, and the read fan-in). Any bucket whose list
        # reaches beyond the MAX-version window is force-compacted
        # regardless of budget; the set is empty whenever the normal
        # rotation kept up, so steady-state folds pay nothing extra.
        overdue = [b for b, vs in owners.items()
                   if b not in set(rewrite) and b not in set(trickle)
                   and min(_vnum(v) for v in vs)
                   <= cur_v - _STATE_MAX_VERSIONS]
        trickle = sorted(set(trickle) | set(overdue))
        if trickle:
            rewrite = sorted(set(rewrite) | set(trickle))
            append = sorted(set(append) - set(trickle))

    if compact:
        (full_df.withColumn("__bucket", bucket_col)
         .write.mode("overwrite").partitionBy("__bucket")
         .parquet(dst))
        owners_new = {b: [version] for b in range(n_buckets)}
        rewritten = n_buckets
    else:
        cols = full_df.columns
        out_rows = (appended_df.select(*cols)
                    .withColumn("__bucket", bucket_col)
                    .filter(F.col("__bucket").isin(append)))
        if rewrite:
            out_rows = (full_df.withColumn("__bucket", bucket_col)
                        .filter(F.col("__bucket").isin(rewrite))
                        .unionByName(out_rows))
        out_rows.write.mode("overwrite").partitionBy("__bucket") \
            .parquet(dst)
        owners_new = dict(owners)
        for b in rewrite:
            owners_new[b] = [version]
        for b in append:
            owners_new[b] = owners_new.get(b, []) + [version]
        rewritten = len(rewrite)
    layout = {"buckets": n_buckets,
              "bucket_owners": {str(b): v for b, v
                                in owners_new.items()}}
    stats = {"buckets_rewritten": rewritten,
             "versions_referenced": len(
                 set().union(*owners_new.values()))}
    return layout, stats


def _read_layered(spark, root: str, layout: dict, sub: str) -> DataFrame:
    """Assemble one layered store: union of per-version reads, each
    pruned to the ``__bucket`` partitions that version contributes."""
    n_buckets = int(layout["buckets"])
    by_ver: dict = {}
    for b, vs in layout["bucket_owners"].items():
        for v in vs:
            by_ver.setdefault(v, []).append(int(b))
    parts = []
    for v, bks in sorted(by_ver.items()):
        df = spark.read.parquet(fsio.join(root, v, sub))
        if len(bks) < n_buckets:
            df = df.filter(F.col("__bucket").isin(bks))
        parts.append(df)
    cur = parts[0]
    for p in parts[1:]:
        cur = cur.unionByName(p)
    return cur.drop("__bucket")


def read_pipeline_state(spark, out: str) -> tuple:
    """(curation_state_df, semantic_state_df_or_None) — the layout-
    agnostic reader every consumer should use:

    * legacy flat bootstrap stores (``out/state`` + ``out/sem_state``);
    * whole-store version directories (r10 deltas);
    * the BUCKETED layered layout (r11, merge-on-read): the pointer
      meta's ``state_layout.bucket_owners`` maps each hash bucket to
      the ordered LIST of version directories holding its row slices
      (appends layer on; relabel rewrites and compactions reset the
      list); the store is the union of per-version reads, each pruned
      to the ``__bucket`` partitions that version contributes
      (partition pruning keeps the read bucket-scoped).
    """
    root = fsio.join(out, _STATE_ROOT)
    name = fsio.pointer_read(spark, root)
    if name is None:
        cur = spark.read.parquet(fsio.join(out, "state"))
        semp = fsio.join(out, "sem_state")
        sem = spark.read.parquet(semp) \
            if fsio.exists(spark, semp) else None
        return cur, sem
    meta = json.loads(fsio.read_text(spark, fsio.join(root, "_current")))
    vdir = fsio.join(root, name)
    sem_layout = meta.get("sem_layout")
    if sem_layout is not None:
        sem = _read_layered(spark, root, sem_layout, "semantic")
    else:
        semp = fsio.join(vdir, "semantic")
        sem = spark.read.parquet(semp) \
            if fsio.exists(spark, semp) else None
    layout = meta.get("state_layout")
    if layout is None:
        return spark.read.parquet(fsio.join(vdir, "curation")), sem
    return _read_layered(spark, root, layout, "curation"), sem


def _read_or_empty(spark, path: str, like: DataFrame) -> DataFrame:
    """Read a parquet dir that may hold zero data files (a partitioned
    write of an empty frame leaves only ``_SUCCESS``) with ``like``'s
    schema, or an empty frame when absent entirely.

    Only the empty-table/analysis error maps to "empty" — a genuinely
    unreadable store (permissions, corrupt footer at listing time) must
    fail the fold loudly, not silently drop its rows (ADVICE r10)."""
    if fsio.exists(spark, path):
        try:
            return spark.read.schema(like.schema).parquet(path)
        except AnalysisException:
            pass
    return spark.createDataFrame([], like.schema)


def _upsert_feasibility_check(spark, state, changed_ids, cfg) -> None:
    """Refuse an upsert whose OLD-content removal would need a text we
    never retained (VERDICT r11 §next-4 scope boundary).

    Removing a changed doc's old fingerprint row is only safe when
    every REMAINING member of its near-dup component still resolves to
    the component's ORIGINAL survivor: the stored labels then remain
    a correct summary of stored connectivity and nothing unpublished
    needs promoting. Two situations break that — the changed doc WAS
    the survivor of a multi-member cluster (a loser must be promoted,
    but simhash losers' texts are not retained, only their 32-40 B
    fingerprints), or it was a connectivity BRIDGE whose removal
    splits the cluster (the split-off side needs its own survivor).
    Both are detected exactly from the stored fingerprints alone: the
    affected components' remaining members are re-paired with the
    same banded join the bootstrap used (cost: affected components
    only) and re-labeled; any member whose label moves is a needed
    promotion → refuse loudly, naming examples. The general fix —
    retaining gated-out texts in a side store the way sem_dropped
    retains semantic losers — ships as dedup_dropped/ (new bootstraps
    PROMOTE instead of refusing; this check is the legacy path).

    Known blind spot, inherent to store-less dirs: EXACT-dup losers
    have no fingerprint-state row at all, so a changed keeper whose
    copies should re-surface in a rebuild is undetectable here — the
    fold proceeds and silently diverges on those copies. Re-bootstrap
    (which writes the store) before relying on re-crawl folds.
    """
    from dexscraper_spark.operators.dedup import dedup_components
    from dexscraper_spark.plans.curation import _near_pairs

    aff = state.join(changed_ids, "doc_id", "left_semi") \
        .select("component").distinct()
    members = state.join(aff, "component", "left_semi")
    remaining = tracked_persist(
        members.join(changed_ids, "doc_id", "left_anti"))
    try:
        fps = remaining.select("doc_id",
                               *[F.col(c) for c in cfg.fp_cols])
        pairs = _near_pairs(fps, cfg, id_col="doc_id")
        comps = dedup_components(pairs, id_a="id_a", id_b="id_b") \
            .select(F.col("node").alias("doc_id"),
                    F.col("component").alias("__c"))
        relabeled = (remaining.join(comps, "doc_id", "left")
                     .withColumn("__new", F.coalesce(F.col("__c"),
                                                     F.col("doc_id")))
                     .filter(F.col("__new") != F.col("component")))
        bad = relabeled.select("doc_id").limit(5).collect()
    finally:
        remaining.unpersist()
    if bad:
        ids = ", ".join(str(r["doc_id"]) for r in bad)
        raise PipelineArgError(
            "--upsert cannot remove the changed doc(s)' old content: "
            f"near-dup cluster member(s) {ids} would need a new "
            "published survivor, and this output dir predates the "
            "dedup_dropped loser-text store, so their texts were "
            "never retained (only fingerprints). Re-bootstrap on the "
            "updated corpus for this slice (new bootstraps write the "
            "store and later upserts PROMOTE instead of refusing), "
            "or re-crawl the affected cluster's members in the same "
            "slice")


# ---- retained-loser store (dedup_dropped/) --------------------------
# Every gated doc that LOST a dedup stage (exact: a larger-id copy of
# a kept text; near: a simhash-cluster loser) keeps its full gated row
# — (doc_id, text, lang, quality, n_tokens) — in an id-range-
# partitioned side table, the curation-stage analogue of sem_dropped.
# Two consumers:
#   * --upsert PROMOTION: removing a changed doc's old content can
#     make a stored loser the new min-id survivor of its cluster (or
#     of its exact-hash group) — exactly what a rebuild on the updated
#     corpus publishes. The store holds the text the promotion needs,
#     so the fold promotes instead of refusing (the r11 scope
#     boundary, now closed for store-bearing dirs).
#   * exact-copy continuity: exact-dup losers have NO state row (they
#     never reach the fingerprint graph), so without the store an
#     upsert removing a doc that had exact copies would silently
#     diverge from the rebuild (the copy should re-surface). The
#     store makes those copies discoverable by content hash.
# Partitioning is by monotone id RANGE (doc_id div 1e6), not hash:
# ids are append-only, so a nightly fold's added losers land in the
# newest range partitions and never rewrite old ones — removals
# (upsert-changed + promoted ids, answer-sized) touch only their own
# ranges. A hash layout would spread every delta across all buckets.
_DROPPED_SUB = "dedup_dropped"
_DROPPED_RANGE = 1_000_000


def _batch_scan(spark, out: str, batch: str, name: str,
                df: DataFrame) -> DataFrame:
    """Write ``df`` ONCE under ``<out>/_delta/<batch>/<name>`` and
    return a scan of it (reuse the file when it already exists).

    The fold's crash-replay contract needs this for every frame that
    is DERIVED from a mutable table and CONSUMED by a later mutation
    of that same table (or of a table ordered after it): e.g.
    ``add_docs`` carries resurrected docs' rows pulled from
    sem_dropped/, which the sem_dropped merge then REMOVES — a replay
    recomputing add_docs from live sources after that merge (but
    before the corpus merge that consumes it) would silently lose the
    resurrection rows. The batch-scoped file freezes the frame at
    first computation; replays converge by construction. (The
    session-scoped materialize_artifact only gives within-run plan
    stability — its tmp dir does not survive the crash.)

    Reuse is gated on a marker written atomically AFTER the data, not
    on the directory existing: Spark creates the destination (and may
    commit some part files) before a crash, so a bare existence check
    would hand the replay a partial frame with the right schema —
    silently dropping the very rows this freeze protects."""
    dst = fsio.join(out, "_delta", batch, name)
    done = f"{dst}.__done"
    if not fsio.exists(spark, done):
        df.write.mode("overwrite").parquet(dst)
        fsio.write_text_atomic(spark, done, "1")
    return spark.read.schema(df.schema).parquet(dst)


def _dropped_with_range(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "id_range", F.expr(f"doc_id div {_DROPPED_RANGE}"))


def _upsert_apply_removals(spark, state, changed_docs, slice_ids,
                           dropped_path, cfg, persist_dir):
    """State surgery for an upsert's CHANGED docs, against the
    retained-loser store: returns ``(new_state, surgery_ids,
    pending_labels)``.

    Mirrors what a rebuild on the updated corpus computes, restricted
    to the affected rows (everything else is provably unchanged —
    gates are per-doc, and near-dup edges never cross components):

    * the changed rows leave the fingerprint graph;
    * each changed doc that had EXACT copies (same text hash, retained
      in the store, not themselves re-crawled in this slice) is
      REPLACED in the graph by the smallest such copy — identical
      text ⇒ identical fingerprint ⇒ identical connectivity, so the
      replacement inherits the changed doc's fingerprint columns;
    * the affected components' remaining members (plus replacements)
      are re-paired with the same banded join the bootstrap used
      (component-sized, not store-sized) and re-labeled min-id;
    * labels that are no longer an already-published member are
      PENDING PROMOTIONS — returned as a set; the caller finalizes
      them after curate_delta (the re-entering new content may win a
      merged cluster back, in which case the pending label is merged
      under it and nothing is promoted — the relabel/retract path).

    ``surgery_ids`` (changed ∪ affected members incl. replacements)
    feeds the layered write's changed-bucket set: every touched row's
    bucket is rewritten from the new full state, so no stale row
    survives the merge-on-read union.

    The re-labeled member rows + the pending set are written ONCE
    under ``persist_dir`` (batch-scoped) and reused by a crash-replay:
    the surgery reads the dedup_dropped store, which this very fold's
    later store merge rewrites (removing promoted texts), so a replay
    recomputing from live sources would both race the rewrite
    (FILE_NOT_EXIST mid-plan) and resolve differently. Everything
    downstream therefore reads the state pointer (stable until the
    final publish) plus this frozen artifact.
    """
    from dexscraper_spark.operators.dedup import dedup_components
    from dexscraper_spark.plans.curation import _near_pairs

    changed_rows = tracked_persist(
        state.join(changed_docs.select("doc_id"), "doc_id",
                   "left_semi"))
    changed_ids = changed_rows.select("doc_id")
    aff = changed_rows.select("component").distinct()
    members_dst = fsio.join(persist_dir, "members_new")
    meta_dst = fsio.join(persist_dir, "meta.json")

    if not fsio.exists(spark, meta_dst):
        # exact-copy replacements, by content hash against the store
        # (explicit schema: a bootstrap with zero dedup losers leaves
        # a _SUCCESS-only partitioned dir schema inference rejects)
        try:
            store = spark.read.schema("doc_id long, text string") \
                .parquet(dropped_path)
        except AnalysisException:
            store = spark.createDataFrame(
                [], "doc_id long, text string")
        copies = (store
                  .select("doc_id",
                          F.xxhash64(F.col("text")).alias("exact_h"))
                  .join(slice_ids, "doc_id", "left_anti")
                  .groupBy("exact_h")
                  .agg(F.min("doc_id").alias("__new_id")))
        replacements = (
            changed_rows.join(copies, "exact_h")
            .withColumn("doc_id", F.col("__new_id")).drop("__new_id")
            .select(*state.columns))

        members = tracked_persist(
            state.join(changed_ids, "doc_id", "left_anti")
            .join(aff, "component", "left_semi")
            .unionByName(replacements))
        fps = members.select("doc_id",
                             *[F.col(c) for c in cfg.fp_cols])
        pairs = _near_pairs(fps, cfg, id_col="doc_id")
        comps = dedup_components(pairs, id_a="id_a", id_b="id_b") \
            .select(F.col("node").alias("doc_id"),
                    F.col("component").alias("__c"))
        (members.join(comps, "doc_id", "left")
         .withColumn("component",
                     F.coalesce(F.col("__c"), F.col("doc_id")))
         .drop("__c").select(*state.columns)
         .write.mode("overwrite").parquet(members_dst))

        members_new = spark.read.schema(state.schema) \
            .parquet(members_dst)
        published = {int(r["component"]) for r in aff.collect()} - \
            {int(r["doc_id"]) for r in changed_ids.collect()}
        pending = sorted(
            {int(r["component"]) for r in
             members_new.select("component").distinct().collect()}
            - published)
        fsio.write_text_atomic(spark, meta_dst,
                               json.dumps({"pending": pending}))
    members_new = spark.read.schema(state.schema).parquet(members_dst)
    pending = set(json.loads(
        fsio.read_text(spark, meta_dst))["pending"])

    surgery_ids = (changed_ids
                   .unionByName(members_new.select("doc_id"))
                   .distinct())
    new_state = (state.join(changed_ids, "doc_id", "left_anti")
                 .join(aff, "component", "left_anti")
                 .unionByName(members_new))
    return new_state, tracked_persist(surgery_ids), pending


def run_delta(spark, args) -> dict:
    """Fold a NEW crawl slice into a bootstrapped pipeline output dir.
    See the module docstring for the composition and the crash story.

    The whole fold runs under ``<out>/_delta/__fold.lock`` (VERDICT
    r11 §wrong-2): two overlapping folds — a cron firing while last
    night's long fold still runs — would both read the same state and
    the second pointer flip would silently discard the first fold's
    rows (and their corpus/shard merges could interleave). The lease
    makes the overlap LOUD at fold start; a crashed holder's lock is
    cleared with ``--break-lease``. Defense-in-depth for writers that
    ignore the lease: the state publish itself passes
    ``expect_current`` and refuses the flip when the pointer moved
    since this fold read it (see :func:`fsio.pointer_publish`).

    The lock is released on success and on PRE-MUTATION refusals
    (arg/knob validation, upsert feasibility) — those leave the out
    dir untouched, so the next fold may proceed. Once the fold has
    started editing shared tables, a propagating exception KEEPS the
    lock (stamped ``failed``): the tables carry this fold's partial,
    replay-idempotent merges, and a different slice folding onto them
    silently would bake the orphaned rows into its own outputs. The
    operator reruns the SAME batch with ``--break-lease`` (the replay
    converges — same recovery as a process kill, which also leaves
    the lock behind)."""
    import os as _os
    import time as _time

    out = args.out
    lock = fsio.join(out, "_delta", "__fold.lock")
    if getattr(args, "break_lease", False):
        fsio.delete(spark, lock)
    if not fsio.create_exclusive(spark, lock, json.dumps(
            {"pid": _os.getpid(), "ts": int(_time.time()),
             "docs": getattr(args, "docs", None)})):
        try:
            holder = fsio.read_text(spark, lock)
        except OSError:
            holder = "<unreadable>"
        raise PipelineArgError(
            f"delta fold lease {lock} is held ({holder}) — two folds "
            "must not run concurrently on one --out: the later "
            "publish would silently discard the earlier fold's rows. "
            "If the holder is live, wait for it; if it crashed (or "
            "failed mid-merge), rerun the SAME slice with "
            "--break-lease")
    fold_state = {"mutated": False}
    ok = False
    try:
        result = _run_delta_locked(spark, args, fold_state)
        ok = True
        return result
    finally:
        if ok or not fold_state["mutated"]:
            fsio.delete(spark, lock)
        else:
            fsio.write_text_atomic(spark, lock, json.dumps(
                {"pid": _os.getpid(), "ts": int(_time.time()),
                 "docs": getattr(args, "docs", None),
                 "failed": "fold raised after shared-table merges "
                           "began; rerun the same slice with "
                           "--break-lease to replay-converge"}))


def _run_delta_locked(spark, args, fold_state=None) -> dict:
    from dexscraper_spark.operators.dedup import semantic_dedup_delta
    from dexscraper_spark.plans.curation import (
        CurationConfig, apply_state_updates, curate_delta,
        merge_partitioned, update_training_shards)

    out = args.out
    if args.target_docs:
        raise PipelineArgError(
            "--delta cannot combine with --target-docs: DSIR draws "
            "against the WHOLE pool's raw LM, which a delta slice "
            "cannot reproduce — run selection at bootstrap, or "
            "re-bootstrap")
    mode = args.mode or "chunk"
    if mode not in ("chunk", "bins"):
        raise PipelineArgError("--mode must be chunk or bins")
    split_max = args.split_max_tokens
    if split_max is None:
        split_max = args.max_tokens
    if not fsio.exists(spark, fsio.join(out, "curated")) \
            or not fsio.exists(spark, fsio.join(out, "shards",
                                                "_manifest.json")):
        raise PipelineArgError(
            f"--delta needs a bootstrapped --out ({out} lacks curated/ "
            "or shards/_manifest.json — run the full pipeline first)")

    # knob consistency vs the bootstrap (VERDICT r10 §missing-2): the
    # state stores hold fingerprints computed under the bootstrap's
    # knobs; folding with different ones silently voids the
    # rebuild-equivalence contract. Refuse loudly, naming both values.
    knobs_path = fsio.join(out, "_knobs.json")
    if fsio.exists(spark, knobs_path):
        boot = json.loads(fsio.read_text(spark, knobs_path))
        mine = _delta_knobs(args, split_max)
        bad = [(k, boot[k], mine[k]) for k in sorted(boot)
               if k in mine and boot[k] != mine[k]]
        if bad:
            raise PipelineArgError(
                "--delta knob mismatch vs bootstrap: " + "; ".join(
                    f"{k}: bootstrap={b!r} delta={m!r}"
                    for k, b, m in bad)
                + " — the state stores were computed under the "
                "bootstrap's knobs; rerun with matching flags or "
                "re-bootstrap")
    else:
        print("pipeline: WARNING bootstrap predates the _knobs.json "
              "record — cannot verify the delta's knobs match; the "
              "fold trusts the caller", file=sys.stderr)

    # batch identity: same slice CONTENT + same knobs => same batch.
    # The state pointer records which batch it folded, so a rerun after
    # a crash that happened AFTER the state publish short-circuits to a
    # no-op instead of tripping curate_delta's monotone-id check.
    #
    # The PATH alone is not identity (VERDICT r10 "what's wrong" #2): a
    # nightly job that overwrites a stable slice path (--docs
    # /data/latest) must fold every night, not hit night 1's _PUBLISHED
    # marker and silently rc=0-drop the new data. Fold a cheap content
    # fingerprint — row count + an order-independent id-hash sum +
    # max id, one column-pruned scan of the (delta-sized) slice — into
    # the id. Id-granular is the right level: curate_delta's monotone-id
    # precondition already rejects re-folding an existing doc_id, so two
    # slices with identical id sets ARE the same batch to the fold.
    docs = spark.read.parquet(args.docs)
    _check_doc_id(docs)
    upsert = bool(getattr(args, "upsert", False))
    fp_aggs = [
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: order/partition-independent like sum but
        # cannot overflow under ANSI mode
        F.expr("bit_xor(xxhash64(doc_id))").alias("idsum"),
        F.max("doc_id").alias("max_id")]
    if upsert:
        # an upsert's identity is (id, content) pairs, not ids: the
        # whole point is re-folding a slice whose ids are unchanged
        # but whose texts moved (VERDICT r11 §missing-3). Non-upsert
        # folds keep the id-granular fingerprint so existing batch
        # ids (and their _PUBLISHED markers) stay valid.
        fp_aggs.append(
            F.expr("bit_xor(xxhash64(doc_id, text))").alias("content"))
    fp = docs.agg(*fp_aggs).first()
    knobs = {k: getattr(args, k, None) for k in (
        "docs", "eval_docs", "quality_model", "quality_alpha",
        "min_quality", "min_tokens", "fingerprint_bits", "embeddings",
        "semantic_threshold", "semantic_nlist", "split_max_tokens",
        "stride", "max_tokens", "num_shards")}
    knobs["slice_fingerprint"] = {
        "n": int(fp["n"]),
        "idsum": None if fp["idsum"] is None else int(fp["idsum"]),
        "max_id": None if fp["max_id"] is None else int(fp["max_id"])}
    if upsert:
        knobs["upsert"] = True
        knobs["slice_fingerprint"]["content"] = \
            None if fp["content"] is None else int(fp["content"])
    batch = hashlib.sha256(_canon(knobs).encode()).hexdigest()[:12]
    pub_marker = fsio.join(out, "_delta", batch, "_PUBLISHED")
    if fsio.exists(spark, pub_marker):
        summary = json.loads(fsio.read_text(spark, pub_marker))
        print(f"pipeline: delta batch {batch} already folded — no-op",
              file=sys.stderr)
        return summary
    state_root = fsio.join(out, _STATE_ROOT)
    ptr = fsio.pointer_read(spark, state_root)
    if ptr is not None:
        meta = json.loads(fsio.read_text(
            spark, fsio.join(state_root, "_current")))
        # the bucket count is frozen at the first fold: a later fold's
        # mismatched explicit --state-buckets was silently ignored in
        # r11 (the layout correctly wins) — treat it like every other
        # knob and refuse loudly, naming both values (VERDICT r11
        # §next-5 / §missing-5)
        req_b = getattr(args, "state_buckets", None)
        if req_b:
            for lay_key in ("state_layout", "sem_layout"):
                lay = meta.get(lay_key)
                if lay and int(lay["buckets"]) != int(req_b):
                    raise PipelineArgError(
                        f"--state-buckets {req_b} does not match the "
                        f"layered store's recorded layout "
                        f"({lay['buckets']} buckets, {lay_key}) — the "
                        "bucket count is fixed when the store is "
                        "seeded; drop the flag (the layout wins) or "
                        "re-bootstrap to change it")
        if meta.get("batch") == batch:
            # crashed between the pointer flip and the marker: the
            # fold is complete (merges precede the flip) — finish the
            # bookkeeping from the pointer's recorded summary
            summary = meta.get("summary", {"mode": "pipeline-delta",
                                           "batch": batch})
            fsio.mkdirs(spark, fsio.join(out, "_delta", batch))
            fsio.write_text_atomic(spark, pub_marker,
                                   json.dumps(summary))
            print(f"pipeline: delta batch {batch} had already "
                  "published its state — completed the marker",
                  file=sys.stderr)
            return summary

    summary = {"mode": "pipeline-delta", "batch": batch}
    summary["input_docs"] = int(fp["n"])

    # ---- state read (before anything else consults or edits it) ----
    # remember which pointer version the state was read from: the
    # publish at the end passes it as expect_current, so a concurrent
    # publish interleaving this fold's read→flip span is refused
    # loudly instead of silently losing one fold's rows
    state_read_ptr = fsio.pointer_read(spark, state_root)
    state, sem_state_stored = read_pipeline_state(spark, out)
    cfg = CurationConfig(min_quality=args.min_quality,
                         min_tokens=args.min_tokens,
                         fingerprint_bits=args.fingerprint_bits)

    # ---- upsert split (VERDICT r11 §next-4 / §missing-3) -----------
    # A re-crawled slice carries ids the store already knows. Split on
    # stored identity BEFORE any gate runs (a changed doc whose new
    # text now fails decontamination/quality must still be REMOVED,
    # exactly as a rebuild on the updated corpus would drop it):
    #   * unchanged (stored exact_h == xxhash64(new text)) — no-op;
    #   * changed  (stored row, different hash) — retract the old
    #     content (state row leaves, published row/shards retract,
    #     stale index code tombstoned) and re-enter the NEW content
    #     through the normal fold;
    #   * revived  (no stored row, id ≤ stored max) — a doc the
    #     bootstrap gated out, re-crawled: no removal, re-enters;
    #   * truly new (id > stored max) — the normal delta path.
    upsert_changed_ids = None
    upsert_surgery_ids = None
    upsert_pending: set = set()
    dropped_path = fsio.join(out, _DROPPED_SUB)
    has_dropped_store = fsio.exists(spark, dropped_path)
    if upsert:
        hi_stored = state.agg(F.max("doc_id")).first()[0]
        docs_h = docs.withColumn("__h", F.xxhash64(F.col("text")))
        jd = tracked_persist(docs_h.join(
            state.select("doc_id", F.col("exact_h").alias("__old_h")),
            "doc_id", "left"))
        slice_cols = docs.columns
        changed_docs = tracked_persist(
            jd.filter(F.col("__old_h").isNotNull()
                      & (F.col("__old_h") != F.col("__h")))
            .select(*slice_cols))
        fresh_docs = jd.filter(F.col("__old_h").isNull()) \
            .select(*slice_cols)
        n_changed = changed_docs.count()
        summary["upsert_unchanged"] = jd.filter(
            F.col("__old_h") == F.col("__h")).count()
        summary["upsert_changed"] = n_changed
        summary["upsert_revived"] = 0 if hi_stored is None else \
            fresh_docs.filter(F.col("doc_id") <= hi_stored).count()
        if n_changed:
            upsert_changed_ids = changed_docs.select("doc_id")
            if has_dropped_store:
                # the general path: graph surgery + pending promotions
                # against the retained-loser store — the fold's
                # working state loses the changed rows, gains exact-
                # copy replacements, and the affected components'
                # members carry re-resolved min-id labels (what a
                # rebuild on the updated corpus computes, restricted
                # to the affected rows)
                state, upsert_surgery_ids, upsert_pending = \
                    _upsert_apply_removals(
                        spark, state, changed_docs,
                        docs.select("doc_id"), dropped_path, cfg,
                        fsio.join(out, "_delta", batch, "surgery"))
                state = tracked_persist(state)
            else:
                # legacy dir (pre-store bootstrap): loser texts were
                # never retained — refuse removals that would need one
                _upsert_feasibility_check(spark, state,
                                          upsert_changed_ids, cfg)
                # the fold's working state is the store MINUS the
                # changed rows: their old fingerprints leave the
                # search universe (the new content re-enters below),
                # and the layered write rewrites their buckets so no
                # old row survives the merge
                state = state.join(upsert_changed_ids, "doc_id",
                                   "left_anti")
        docs = tracked_persist(fresh_docs.unionByName(changed_docs))
    # pre-filter id set: the dedup_dropped removals below must cover
    # every folding doc, including ones decontamination/quality drop
    # from `docs` — a re-crawled loser whose NEW text fails a filter
    # leaves the universe entirely (as the rebuild would drop it), so
    # its stale OLD-text store row must not linger as promotable
    slice_fold_ids = tracked_persist(docs.select("doc_id"))

    # ---- pre-processing (per-doc deterministic => identical to the
    # full rebuild's verdicts on the same docs) ----------------------
    if args.eval_docs:
        from dexscraper_spark.operators.decontaminate import decontaminate
        docs, removed = decontaminate(
            docs, spark.read.parquet(args.eval_docs))
        removed = tracked_persist(removed)
        summary["contaminated"] = removed.count()
        removed.write.mode("overwrite").parquet(
            fsio.join(out, "_delta", batch, "contaminated"))
    if args.quality_model:
        from dexscraper_spark.operators.classifier import (qc_filter,
                                                           qc_load)
        docs = tracked_persist(docs)
        n_in = docs.count()
        qcm = qc_load(spark, args.quality_model)
        docs = tracked_persist(
            qc_filter(docs, qcm, alpha=args.quality_alpha).drop("prob"))
        summary["quality_dropped"] = n_in - docs.count()

    # ---- curation fold against the fingerprint store ----------------
    # Upsert folds carry ids at or below the stored watermark by
    # design (changed + revived), so curate_delta's blanket monotone
    # check is replaced by the one targeted guard it stands for here:
    # the exact-hash shortcut ("a stored keeper never loses") must
    # not invert — a fold doc whose text equals a stored doc's with a
    # LARGER id would, in a rebuild, displace that keeper, which the
    # shortcut cannot express; refused loudly. Near-dup math needs no
    # guard: contraction + min-id components already handle a
    # small-id fold doc winning a merged cluster — that is the
    # ordinary relabel/retract path.
    if upsert:
        inv = docs.withColumn("__h", F.xxhash64(F.col("text"))).join(
            state.select(F.col("exact_h").alias("__h"),
                         F.col("doc_id").alias("__sid")), "__h") \
            .filter(F.col("__sid") > F.col("doc_id")) \
            .select("doc_id", "__sid").limit(5).collect()
        if inv:
            pairs = ", ".join(f"{r['doc_id']}<-{r['__sid']}"
                              for r in inv)
            raise PipelineArgError(
                "--upsert exact-hash inversion: fold doc(s) share a "
                f"text with a LARGER stored id ({pairs}); a rebuild "
                "would displace the stored keeper, which the "
                "incremental fold cannot — re-bootstrap or re-crawl "
                "under the larger id")
        delta = curate_delta(docs, state, config=cfg,
                             check_ids=False)
    else:
        delta = curate_delta(docs, state, config=cfg)
    curated_new = tracked_persist(delta.curated_new)
    retracted = tracked_persist(delta.retracted)
    summary["curated_new"] = curated_new.count()
    summary["retracted"] = retracted.count()

    # ---- upsert promotions (finalized AFTER curate_delta) -----------
    # A pending label is promoted only if it SURVIVED the fold: the
    # re-entering changed content can win its old cluster back (its id
    # is the historical min), in which case curate_delta relabels the
    # pending label under it — the ordinary relabel/retract path, and
    # nothing unpublished is promoted (matching the rebuild, where the
    # new text simply stays the cluster's survivor). Promotion rows
    # are the retained gated rows + the deterministic split — exactly
    # what the rebuild's curation stage emits for them. The rows are
    # written batch-scoped BEFORE the store removals below, so a
    # crash-replay re-reads them even though the store no longer
    # holds the texts.
    merged_pending: set = set()
    promoted_ids: list = []
    if upsert_pending:
        lblmap = {int(r["old_label"]) for r in
                  delta.relabeled.select("old_label").collect()}
        merged_pending = upsert_pending & lblmap
        promoted_ids = sorted(upsert_pending - merged_pending)
    if promoted_ids:
        from dexscraper_spark.operators.dedup import split_assignment
        from dexscraper_spark.plans.curation import _gate
        dropped_schema = _dropped_with_range(
            _gate(docs.limit(0), "doc_id", "text", cfg)).schema
        promoted_rows = _batch_scan(
            spark, out, batch, "promoted",
            spark.read.schema(dropped_schema).parquet(dropped_path)
            .filter(F.col("doc_id").isin(promoted_ids))
            .drop("id_range"))
        got = {int(r["doc_id"]) for r in
               promoted_rows.select("doc_id").collect()}
        missing = sorted(set(promoted_ids) - got)
        if missing:
            raise PipelineArgError(
                "--upsert promotion needs retained loser text(s) for "
                f"doc_id(s) {missing[:5]} but the dedup_dropped store "
                "does not hold them — the store is out of sync with "
                "the fingerprint state; re-bootstrap this output dir")
        promoted_rows = promoted_rows.withColumn(
            "split", split_assignment(F.col("doc_id"),
                                      train_pct=cfg.train_pct,
                                      valid_pct=cfg.valid_pct))
        summary["upsert_promoted"] = len(promoted_ids)
        # from here on promoted docs ride the normal new-survivor
        # path: semantic dedup (new_emb), corpus add, shards, ANN
        # extend — and can still lose the SEMANTIC stage, exactly as
        # the rebuild's curation output would
        curated_new = tracked_persist(
            curated_new.unionByName(
                promoted_rows.select(*curated_new.columns)))
    elif upsert:
        summary["upsert_promoted"] = 0

    # ---- semantic fold ----------------------------------------------
    curated_path = fsio.join(out, "curated")
    curated_live = spark.read.parquet(curated_path)
    # upsert: changed docs whose OLD content was published leave the
    # corpus/shards (and their stale index codes get tombstoned); the
    # NEW content re-enters through add_docs if it wins the fold —
    # same-id remove+add resolves to the new row in the partition
    # merges. Changed-but-never-published ids need no removal actions.
    changed_pub = None
    if upsert_changed_ids is not None:
        # batch-scoped file, not persist or a session tmp: this frame
        # scans curated/, which the corpus merge below rewrites — a
        # recompute after the merge (cache eviction within the run, or
        # a crash-replay) would read the post-edit table and lose the
        # set
        changed_pub = _batch_scan(
            spark, out, batch, "changed_pub",
            upsert_changed_ids.join(curated_live.select("doc_id"),
                                    "doc_id", "left_semi"))
    sem_state_out = None
    add_docs = curated_new
    removed_docs = retracted
    if changed_pub is not None:
        removed_docs = removed_docs.unionByName(changed_pub).distinct()
    if args.embeddings:
        if sem_state_stored is None:
            raise PipelineArgError(
                "--embeddings on a --delta run needs the bootstrap's "
                "sem_state/ (the full pipeline must also have run "
                "with --embeddings)")
        emb = spark.read.parquet(args.embeddings)
        if "doc_id" not in emb.columns and "vec_id" in emb.columns:
            emb = emb.withColumnRenamed("vec_id", "doc_id")
        new_emb = emb.select("doc_id", "embedding").join(
            curated_new.select("doc_id"), "doc_id", "left_semi")
        sem_state = sem_state_stored
        # upsert: the changed docs' OLD embeddings leave the semantic
        # universe exactly like retractions (their groups re-resolve,
        # suppressed members resurrect); the NEW embeddings re-enter
        # via new_emb. Upsert ids sit at/below the stored watermark,
        # so the blanket monotone check yields to the curation-side
        # guards (see the curate_delta call above).
        sem_removed = retracted
        if upsert_changed_ids is not None:
            sem_removed = sem_removed.unionByName(
                upsert_changed_ids).distinct()
        sd = semantic_dedup_delta(
            new_emb, sem_state, removed_ids=sem_removed,
            id_col="doc_id", nlist=args.semantic_nlist,
            threshold=args.semantic_threshold,
            assign_n=args.assign_n, check_ids=not upsert)
        dropped_new = tracked_persist(sd.dropped_new)
        resurrected = tracked_persist(sd.resurrected)
        demoted = tracked_persist(sd.demoted)
        sem_state_out = sd.state
        summary["semantic_dropped_new"] = dropped_new.count()
        summary["resurrected"] = resurrected.count()
        summary["demoted"] = demoted.count()

        sem_dropped_path = fsio.join(out, "sem_dropped")
        sem_dropped = _read_or_empty(spark, sem_dropped_path,
                                     curated_live)
        res_rows = sem_dropped.join(resurrected, "doc_id", "left_semi")
        # BATCH-SCOPED files before any merge below: add_docs reads
        # sem_dropped (which the sem_dropped merge rewrites) and
        # drop_adds reads curated/ (which the corpus merge rewrites) —
        # a lazy frame scanned after its source table was merged would
        # silently read the post-edit state, and a crash-replay that
        # recomputes them between the two merges would lose the
        # resurrection/demotion rows for good (the first attempt's
        # merge already removed them from the source table)
        add_docs = _batch_scan(
            spark, out, batch, "add_docs",
            curated_new.join(dropped_new, "doc_id", "left_anti")
            .unionByName(res_rows))
        removed_docs = retracted.unionByName(demoted)
        if changed_pub is not None:
            removed_docs = removed_docs.unionByName(changed_pub)
        removed_docs = tracked_persist(removed_docs.distinct())

        # sem_dropped bookkeeping (idempotent partition merge): demoted
        # docs' rows enter (pulled from the live corpus BEFORE the
        # corpus merge removes them), dropped-new docs' rows enter,
        # resurrected + retracted leave
        drop_adds = _batch_scan(
            spark, out, batch, "drop_adds",
            curated_live.join(demoted, "doc_id", "left_semi")
            .unionByName(curated_new.join(
                dropped_new, "doc_id", "left_semi")))
        drop_removals = resurrected.unionByName(retracted)
        if upsert_changed_ids is not None:
            # a changed doc's stale sem_dropped row (old text) must
            # not linger — a later resurrection would republish the
            # superseded content
            drop_removals = drop_removals.unionByName(
                upsert_changed_ids)
        drop_removals = drop_removals.distinct()
        if fold_state is not None:
            # first shared-table edit: from here a propagating
            # exception keeps the fold lease (see run_delta)
            fold_state["mutated"] = True
        if fsio.exists(spark, sem_dropped_path):
            # explicit schema: a bootstrap with ZERO semantic losers
            # writes an empty partitioned table (only _SUCCESS), which
            # schema inference rejects — a normal state, not an error
            merge_partitioned(
                spark, sem_dropped_path,
                partition_cols=["split", "lang"], add=drop_adds,
                remove_ids=drop_removals, remove_col="doc_id",
                key_col="doc_id", schema=curated_live.schema)
        else:
            drop_adds.write.mode("overwrite") \
                .partitionBy("split", "lang").parquet(sem_dropped_path)
    else:
        # the non-semantic add set still carries upsert promotions
        # pulled from dedup_dropped/ (rewritten by the store merge
        # below) — freeze it batch-scoped like the semantic twin
        add_docs = _batch_scan(spark, out, batch, "add_docs", add_docs)
        removed_docs = tracked_persist(removed_docs)
    summary["corpus_added"] = add_docs.count()
    summary["corpus_removed"] = removed_docs.count()

    if fold_state is not None:
        # first shared-table edit on the non-semantic path (the store
        # merge below, then the corpus merge)
        fold_state["mutated"] = True

    # ---- retained-loser store fold (dedup_dropped/) ------------------
    # Adds: the slice's gated docs that did not survive curation (exact
    # + near losers, under their CURRENT text) plus this fold's
    # retracted old survivors (they are losers of the merged cluster
    # now — their rows come from curated/ BEFORE the corpus merge
    # rewrites it, written batch-scoped so a crash-replay after the
    # merge still has them). Removals: every slice id (its fate is
    # recomputed this fold; if it is still a loser its fresh row is in
    # the adds) plus promoted ids (published now). Id-range
    # partitioning keeps the rewrite to the delta's own ranges — old
    # ranges are touched only by answer-sized removals.
    if has_dropped_store:
        from dexscraper_spark.plans.curation import _gate
        gated_slice = _gate(docs, "doc_id", "text", cfg)
        dropped_schema = _dropped_with_range(gated_slice).schema
        store_adds = _batch_scan(
            spark, out, batch, "dropped_adds",
            _dropped_with_range(
                gated_slice.join(curated_new.select("doc_id"),
                                 "doc_id", "left_anti")
                .unionByName(
                    curated_live.join(retracted, "doc_id", "left_semi")
                    .select(*gated_slice.columns))))
        store_rm = slice_fold_ids
        if promoted_ids:
            store_rm = store_rm.unionByName(
                spark.createDataFrame([(int(i),) for i in promoted_ids],
                                      "doc_id long"))
        merge_partitioned(
            spark, dropped_path, partition_cols=["id_range"],
            add=store_adds, remove_ids=store_rm, remove_col="doc_id",
            key_col="doc_id", schema=dropped_schema)
        summary["dedup_dropped_added"] = store_adds.count()

    # ---- corpus merge (idempotent partition-level rewrite) ----------
    merge_partitioned(
        spark, curated_path, partition_cols=["split", "lang"],
        add=add_docs.select(*curated_live.columns),
        remove_ids=removed_docs, remove_col="doc_id", key_col="doc_id",
        schema=curated_live.schema)

    # ---- pieces + shard fold + delta-local pack ----------------------
    pieces = tracked_persist(_pieces_of(
        add_docs, split_max=split_max, stride=args.stride))
    st = pieces.agg(
        F.count(F.lit(1)).alias("n"), F.max("window_id").alias("max_w"),
        F.max("doc_id").alias("max_d"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tok")).first()
    _budget_check(st)
    summary["pieces_new"] = st["n"]
    summary["tokens_new"] = int(st["tok"])
    manifest = update_training_shards(
        spark, fsio.join(out, "shards"),
        add=pieces.select("piece_id", "doc_id", "window_id", "text",
                          "n_tokens", "split", "lang"),
        remove_ids=removed_docs, remove_col="doc_id")
    summary["shard_docs"] = manifest["total_docs"]

    packed = tracked_persist(_pack_per_split(
        pieces, mode=mode, max_tokens=args.max_tokens,
        num_shards=args.num_shards))
    packed.write.mode("overwrite").parquet(
        fsio.join(out, "_delta", batch, "packed"))
    summary.update(_pack_stats(packed, mode))

    # ---- optional ANN maintenance ------------------------------------
    if getattr(args, "index", None):
        from dexscraper_spark.operators.quantize import (
            ivf_pq_extend_saved, ivf_pq_tombstone)
        vecs = spark.read.parquet(args.embeddings) if args.embeddings \
            else None
        if vecs is None:
            raise PipelineArgError(
                "--index on a --delta run needs --embeddings")
        if "doc_id" not in vecs.columns and "vec_id" in vecs.columns:
            vecs = vecs.withColumnRenamed("vec_id", "doc_id")
        keep_vecs = vecs.select("doc_id", "embedding").join(
            add_docs.select("doc_id"), "doc_id", "left_semi")
        res = ivf_pq_extend_saved(
            spark, args.index,
            keep_vecs.withColumnRenamed("doc_id", "vec_id"))
        summary["ann_appended"] = res["appended"]
        # retracted ∪ demoted ids' codes stay in the index until the
        # next republish — tombstone them so queriers exclude them
        # now. RESURRECTED ids (demoted in a prior fold, re-promoted
        # by this one) are UN-tombstoned in the same leased op: their
        # codes are still in the index and must be servable again
        # without waiting for the next republish (ADVICE r11).
        # EVERY upsert-changed id is tombstoned STICKY — not just the
        # currently-published ones: a doc published in an earlier fold
        # and since demoted still has its (now superseded) code in the
        # index under a CLEARABLE plain mark, and a later
        # demote→resurrect cycle of its re-entered content would
        # re-expose that stale geometry via the clear path. The extend
        # above anti-joins on vec_id, so the new embedding only enters
        # at the next republish; sticky marks for never-indexed ids
        # exclude nothing and the republish clears them.
        # merged-pending labels (an upsert promotion that the re-
        # entering content won back) were never published, so they
        # have no index code — tombstoning them would only inflate
        # pressure and block a future same-id extend
        tomb_ids = removed_docs
        if merged_pending:
            tomb_ids = tomb_ids.filter(
                ~F.col("doc_id").isin(sorted(merged_pending)))
        ts = ivf_pq_tombstone(
            spark, args.index,
            tomb_ids.select("doc_id")
            .withColumnRenamed("doc_id", "vec_id"),
            clear_ids=resurrected.select("doc_id")
            .withColumnRenamed("doc_id", "vec_id"),
            sticky_ids=None if upsert_changed_ids is None else
            upsert_changed_ids.select("doc_id")
            .withColumnRenamed("doc_id", "vec_id"))
        summary["ann_tombstoned"] = ts["tombstoned"]
        summary["ann_tombstones_cleared"] = ts["cleared"]
        summary["ann_tombstones_sticky"] = ts["sticky"]
        # tombstone pressure (VERDICT r11 §next-6): the set only grows
        # between republishes — surface the fraction every fold and
        # recommend a republish once the index is mostly dead weight
        from dexscraper_spark.operators import quantize as _q
        pres = _q.ivf_pq_tombstone_pressure(spark, args.index)
        summary["ann_tombstone_fraction"] = pres["fraction"]
        if pres["fraction"] >= _q.TOMBSTONE_REPUBLISH_FRACTION:
            print(
                f"pipeline: WARNING {pres['tombstones']} of "
                f"{pres['indexed']} indexed vectors "
                f"({pres['fraction']:.0%}) are tombstoned — schedule "
                "an `ann --mode republish` on the live corpus: the "
                "rebuild drops the dead codes and clears the "
                "tombstone set", file=sys.stderr)

    # ---- STATE PUBLISH (last; one atomic pointer flip for BOTH
    # stores, stamped with the batch id) --------------------------------
    #
    # BUCKETED layered write, merge-on-read (VERDICT r10 §missing-4):
    # the fingerprint store is hash-bucketed on
    # pmod(xxhash64(doc_id), B) and each bucket's contents are the
    # UNION of its slices across version dirs — the pointer meta's
    # bucket_owners manifest maps every bucket to the ordered LIST of
    # versions holding its rows (read back by read_pipeline_state;
    # every referenced version is pinned from GC via pointer_publish's
    # retain). Per fold:
    #   * APPENDED rows (delta.state_new) are written delta-sized into
    #     the new version dir and their buckets' owner lists grow by
    #     one — no old row is rewritten (slices are disjoint: ids are
    #     monotone);
    #   * RELABELED buckets (a row whose component merged under a
    #     smaller label) are the only whole-bucket rewrites: the
    #     bucket's assembled rows land relabeled in the new version
    #     and its owner list RESETS to [version];
    #   * a bounded TRICKLE of additional buckets — the ones whose
    #     owner lists reach back to the oldest versions, up to
    #     ceil(B/(_STATE_MAX_VERSIONS-1)) per fold — is compacted
    #     (rewritten from full_df, lists collapse to [version]),
    #     which holds the manifest's version span at
    #     ~_STATE_MAX_VERSIONS WITHOUT any fold ever writing the
    #     whole store (r11 compacted ALL buckets on the fold that
    #     crossed the bound — a latency cliff; VERDICT r11 §next-3).
    # So a nightly fold's state write is |delta| rows + the
    # relabel-affected buckets + ≤budget trickled buckets — never the
    # corpus-sized store in one fold. (The earlier single-owner design
    # rewrote every touched bucket wholly; measured at 5M rows /
    # 5k-doc delta, appends alone touch all 64 buckets and the
    # "scoped" write degenerated to a full rewrite.)
    # The SAME treatment covers the SEMANTIC state (doc_id, embedding,
    # component): at ~4·dim bytes/doc its full rewrite was the LARGER
    # corpus-linear term per fold — embeddings dwarf the 32-40 B
    # fingerprints. Appends = the delta's rows; rewrites =
    # sd.state_changed_ids (relabeled ∪ affected-group members ∪
    # removed rows, all delta-scoped).
    new_state = apply_state_updates(state, delta)
    version = fsio.pointer_next_version(spark, state_root)

    prev_meta: dict = {}
    if fsio.pointer_read(spark, state_root) is not None:
        prev_meta = json.loads(fsio.read_text(
            spark, fsio.join(state_root, "_current")))
    # None → each store derives its own count from its size at seed
    # time (_layered_write); an explicit flag wins at the seed and is
    # validated against the recorded layout on every later fold
    default_b = getattr(args, "state_buckets", None)

    changed_cur = None
    if delta.relabeled.limit(1).count():
        changed_cur = state.join(
            delta.relabeled.select(
                F.col("old_label").alias("component")),
            "component", "left_semi").select("doc_id")
    if upsert_changed_ids is not None:
        # the changed ids' OLD rows live in older version dirs: their
        # buckets must be rewritten from the new full state or the
        # merge-on-read union would yield both rows per doc. With the
        # loser store, the surgery set (changed ∪ exact-copy
        # replacements ∪ re-labeled members) is the full touched-row
        # set — every one of its buckets rewrites.
        touched = upsert_surgery_ids if upsert_surgery_ids is not None \
            else upsert_changed_ids
        changed_cur = touched if changed_cur is None else \
            changed_cur.unionByName(touched).distinct()
    cur_layout, cur_stats = _layered_write(
        spark, state_root, version, "curation",
        full_df=new_state,
        appended_df=delta.state_new.select(*state.columns),
        changed_ids=changed_cur,
        prev_layout=prev_meta.get("state_layout"),
        default_buckets=default_b)
    summary["state_buckets_rewritten"] = cur_stats["buckets_rewritten"]
    summary["state_versions_referenced"] = \
        cur_stats["versions_referenced"]
    meta = {"batch": batch, "summary": summary,
            "state_layout": cur_layout}
    retain = {v for vs in cur_layout["bucket_owners"].values()
              for v in vs}

    if sem_state_out is not None:
        sem_layout, sem_stats = _layered_write(
            spark, state_root, version, "semantic",
            full_df=sem_state_out,
            appended_df=sem_state_out.join(
                new_emb.select("doc_id"), "doc_id", "left_semi"),
            changed_ids=sd.state_changed_ids,
            prev_layout=prev_meta.get("sem_layout"),
            default_buckets=default_b)
        summary["sem_buckets_rewritten"] = \
            sem_stats["buckets_rewritten"]
        summary["sem_versions_referenced"] = \
            sem_stats["versions_referenced"]
        meta["sem_layout"] = sem_layout
        retain |= {v for vs in sem_layout["bucket_owners"].values()
                   for v in vs}

    # ALSO retain every version the PREVIOUS manifest references
    # (ADVICE r11): a laggard reader that resolved the old _current
    # moments before this flip holds the old meta, whose bucket_owners
    # span version dirs beyond the prev pointer dir itself (after a
    # compaction, nearly none of them) — prev-dir retention alone
    # would sweep dirs that reader is mid-union over. One extra
    # publish cycle of retention keeps the old manifest fully
    # readable until the NEXT flip.
    for lay_key in ("state_layout", "sem_layout"):
        lay = prev_meta.get(lay_key)
        if lay:
            retain |= {v for vs in lay["bucket_owners"].values()
                       for v in vs}
    fsio.pointer_publish(spark, state_root, version, meta=meta,
                         keep=2, retain=retain - {version},
                         expect_current=state_read_ptr)
    fsio.mkdirs(spark, fsio.join(out, "_delta", batch))
    fsio.write_text_atomic(spark, pub_marker, json.dumps(summary))
    fsio.write_text_atomic(
        spark, fsio.join(out, "_run_summary_delta.json"),
        json.dumps(summary))
    return summary
