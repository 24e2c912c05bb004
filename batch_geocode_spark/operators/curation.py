"""End-to-end training-data curation pipeline (VERDICT r4 #6): chains
the dedup / decontamination / quality / sampling families into the
canonical corpus-curation job —

    held-out eval split
      → exact dedup (keep min doc_id per identical text)
      → MinHash+LSH near-dup clusters (keep each cluster's min)
      → n-gram decontamination vs the eval split      (d09 shape)
      → semantic (embedding) decontamination          (e06 shape)
      → quality filter (token count / stopword ratio) (t02 shape)
      → deterministic stratified hash sample          (d08 shape)

Every stage is the already-oracle-checked operator; the composition is
deterministic end-to-end, so the whole pipeline has a DuckDB value
oracle (entry_queries.c01) and can be snapshotted with per-stage
row-count metrics in the manifest (``curate_snapshotted``).

Scale shape: each stage is a keyed agg or broadcast join over the
corpus — the corpus never shuffles at full payload width; the only
corpus-keyed shuffles are the dedup aggregates, and the decontamination
stages broadcast the (small) eval side. At 100 TB the stage order
matters: exact dedup runs FIRST so identical boilerplate never reaches
the LSH band join (see ``dedup._banded_candidates`` for the hot-bucket
cap that guards the residual near-identical families).

No counterpart in the reference repo (a per-row geocoding web app);
this module exists for the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep docs passing the t02-style quality gates: at least
    ``min_tokens`` whitespace tokens and a stopword ratio at most
    ``max_stopword_ratio`` (pure Column exprs, no UDFs)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    stop = F.size(F.filter(toks, lambda t: (t == "the") | (t == "a")))
    return docs.filter(
        (F.size(toks) >= min_tokens)
        & (stop / F.size(toks) <= max_stopword_ratio)
    )


def curate_documents(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    eval_mod: int = 7,
    jaccard_threshold: float = 0.5,
    decon_ngram: int = 8,
    semantic_threshold: float = 0.45,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.5,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.1,
    salt: str = "r2",
    base_hash: str = "xxhash64",
    max_band_df: int | None = None,
    with_metrics: bool = False,
) -> DataFrame | tuple[DataFrame, dict]:
    """Run the full curation chain; returns the curated docs DataFrame
    (doc_id, lang, source), or ``(df, metrics)`` with per-stage
    surviving row counts when ``with_metrics`` (each count is one
    lightweight action over id-width intermediates).

    ``embeddings`` (vec_id, embedding) joins on doc_id = vec_id for the
    semantic stage; docs without an embedding pass through it
    unflagged. ``base_hash='md5_60'`` makes the MinHash stage (and so
    the whole pipeline) cross-engine deterministic for the DuckDB
    oracle; production defaults to xxhash64."""
    from batch_geocode_spark.operators import dedup as D
    from batch_geocode_spark.operators import sampling as SA
    from batch_geocode_spark.operators import similarity as S

    metrics: dict[str, int] = {}

    def note(stage: str, df: DataFrame, id_col: str = "doc_id") -> None:
        if with_metrics:
            metrics[stage] = df.select(id_col).count()

    def pin(df: DataFrame) -> DataFrame:
        # with_metrics replays the lazy pipeline prefix once per
        # downstream stage count (ADVICE r5: the exact-dedup groupBy
        # and decontamination joins recompute up to 7x). Lazily
        # checkpointing each stage's id-width decision table makes its
        # expensive subtree compute exactly once — the next note()
        # count is the materializing action. Without metrics there is
        # a single terminal action, so the plan stays pure lineage
        # (r7 A/B: checkpointing here too replaced the estimable agg
        # subtrees with unknown-size leaves, planning the corpus
        # semi/anti joins as SMJ + extra stage barriers — measurably
        # slower than the lineage plan at every load level).
        return df.localCheckpoint(eager=False) if with_metrics else df

    note("input", docs)
    eval_docs = docs.filter(F.col("doc_id") % eval_mod == 0)
    corpus0 = docs.filter(F.col("doc_id") % eval_mod != 0)
    corpus = corpus0
    note("corpus_after_eval_split", corpus)

    # 1. exact dedup: keep the min doc_id of every identical-text group
    keep_exact = pin(
        corpus.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    corpus = corpus.join(keep_exact, "doc_id", "left_semi")
    note("after_exact_dedup", corpus)

    # 2. MinHash near-dup clusters: drop every member except the
    # cluster's keep_doc_id (docs in no cluster survive by definition)
    pairs = D.minhash_lsh_pairs(
        corpus,
        n=4,
        threshold=jaccard_threshold,
        base_hash=base_hash,
        max_band_df=max_band_df,
    )
    clusters = D.dedup_clusters(pairs)
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    drop_near = pin(
        members.join(
            clusters.select(F.col("keep_doc_id").alias("doc_id")), "doc_id", "left_anti"
        )
    )
    corpus = corpus.join(drop_near, "doc_id", "left_anti")
    note("after_near_dedup", corpus)

    # 3. n-gram decontamination vs the eval split (broadcast eval side).
    # Flags are computed over the PRE-DEDUP corpus split, not the
    # deduped `corpus`: leak-flagging is a per-doc predicate (does THIS
    # doc share an n-gram with eval), so flags(corpus0) ∩ corpus ==
    # flags(corpus) and the left_anti result is identical — while the
    # flag branch no longer embeds the exact+near-dedup join prefix a
    # second time in the plan (r7, guide §2.4: the duplicated subtree
    # cost a repeated md5-dedup aggregate + joins per action; oracle
    # c01 likewise derives `leaks` from the full document set).
    leaks = pin(D.decontamination_ids(corpus0, eval_docs, n=decon_ngram))
    corpus = corpus.join(leaks, "doc_id", "left_anti")
    note("after_ngram_decontamination", corpus)

    # 4. semantic decontamination via embeddings (doc_id = vec_id)
    if embeddings is not None:
        eval_vecs = embeddings.filter(F.col("vec_id") % eval_mod == 0)
        corpus_vecs = embeddings.filter(F.col("vec_id") % eval_mod != 0)
        sem = pin(
            S.semantic_decontamination(
                corpus_vecs, eval_vecs, threshold=semantic_threshold
            ).select(F.col("corpus_id").alias("doc_id"))
        )
        corpus = corpus.join(sem, "doc_id", "left_anti")
    note("after_semantic_decontamination", corpus)

    # 5. quality gates
    corpus = quality_filter(
        corpus, min_tokens=min_tokens, max_stopword_ratio=max_stopword_ratio
    )
    note("after_quality_filter", corpus)

    # 6. deterministic stratified sample (content-addressed hash)
    out = SA.stratified_hash_sample(
        corpus,
        key_col="doc_id",
        strata_col="lang",
        fractions=fractions if fractions is not None else {"fr": 1.0, "en": 0.5},
        default_fraction=default_fraction,
        salt=salt,
        token_hash="md5_60" if base_hash == "md5_60" else "xxhash64",
    ).select("doc_id", "lang", "source")
    note("after_stratified_sample", out)

    if with_metrics:
        return out, metrics
    return out


def curate_snapshotted(
    docs: DataFrame,
    table,
    embeddings: DataFrame | None = None,
    n_buckets: int = 32,
    job_id: str | None = None,
    **kwargs,
) -> dict:
    """Curate and write the result as a bucketed snapshot whose manifest
    carries the per-stage row-count metrics — the auditable record a
    curation run leaves behind (how many docs each stage removed)."""
    from batch_geocode_spark.snapshots import write_snapshotted

    out, metrics = curate_documents(
        docs, embeddings=embeddings, with_metrics=True, **kwargs
    )
    return write_snapshotted(
        out,
        table,
        key_col="doc_id",
        n_buckets=n_buckets,
        job_id=job_id,
        metrics={"curation_stages": metrics},
    )
