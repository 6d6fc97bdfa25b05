"""One-call training-corpus materialization.

The LLM-pipeline operators in this package (quality filtering,
benchmark decontamination, corpus dedup, mixture solving, deterministic
shuffle/shard, chunk + pack) are each scale-shaped on their own; this
module wires them into the recipe a training run actually consumes:

    raw docs ──quality──decontaminate──dedup──mixture──shuffle──►
        parquet shards + manifest.json

Design rules, in order of importance at 100 TB:

- **Lazy until the single output write.** Every stage composes into one
  logical plan; nothing is counted or materialized per stage unless the
  caller opts into ``audit=True`` (which pays one count-action per
  stage and records the per-stage survivor curve in the manifest).
  The default manifest derives ALL its statistics from one scan of the
  WRITTEN output — the files are the source of truth, the same
  principle as the txn manifest (``sources/txn.py::_write_data``).
- **Determinism end to end.** Every stochastic decision (mixture
  downsampling, shuffle order, shard membership) is a pure function of
  ``(salt, doc id)`` — rerunning the recipe over the same input
  produces byte-identical shard contents regardless of partitioning,
  cluster size, or run (the layout-independence contract of
  ``operators/sampling.py``).
- **Shards are range-partitioned, not files-per-task.** The shard id
  is a monotone coarsening of the global shuffle order
  (:func:`~etl_workflow_spark.operators.sampling.deterministic_shuffle`),
  so concatenating shards 0..N-1 replays the global permutation and a
  training loader can stride shards independently. (File order is the
  row order only for single-shot builds — one part file per shard;
  after :func:`extend_training_set` use
  ``read_training_set(ordered=True)`` to restore the permutation.)

Capability analog in the reference: the staged load-transform-aggregate
pipeline of ``etl-pipeline.py`` (extract → transform → load with
logged per-stage row counts, lines 24-90) — re-expressed for corpus
construction instead of warehouse loads, with the logging made opt-in
because a count per stage is a full re-evaluation per stage at scale.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .chunking import chunk_documents, pack_sequences
from .dedup import dedup_corpus
from .sampling import deterministic_shuffle, target_mixture, temperature_mixture
from .text import _n_tokens, _passes_quality, decontaminate


def materialize_training_set(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    *,
    quality_filter: bool = True,
    qcls: dict | None = None,
    page_filters: dict | None = None,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 13,
    dedup: bool = True,
    dedup_threshold: float = 0.8,
    keep_quality_col: str | None = None,
    semantic_dedup: dict | None = None,
    image_dedup: dict | None = None,
    video_dedup: dict | None = None,
    audio_dedup: dict | None = None,
    dsir: dict | None = None,
    mixture: dict[str, float] | None = None,
    temperature: float | None = None,
    strata_col: str | None = None,
    chunk_tokens: int | None = None,
    pack_budget: int | None = None,
    num_shards: int = 16,
    salt: str = "train-v1",
    col: str = "text",
    id_col: str = "doc_id",
    audit: bool = False,
) -> dict:
    """Materialize a training-ready corpus at ``out_path`` and return
    its manifest (also written to ``out_path/manifest.json``).

    Stages (each optional, each documented in its own module):

    1. **quality**: drop rows failing the C4/Gopher-style heuristic
       gate (:func:`~.text.text_quality` ``passes_quality``).
    1b. **learned quality gate** (``qcls`` config, r11): drop rows
       scoring below a trained linear classifier's calibrated
       probability (:func:`~.text.quality_classifier_fit` — the
       fastText-style gate of the GPT-3/PaLM pipelines,
       complementing the heuristic gate above). Config keys:
       ``min_prob`` (required, in (0, 1)), exactly ONE of ``pos`` (a
       curated positive-sample DataFrame with column ``col``,
       consumed at build — the FITTED model is what gets recorded)
       or ``model`` (a pretrained fit dict); with ``pos``, optional
       ``neg`` (negative samples; defaults to the raw input ``docs``,
       the paper's positives-vs-crawl shape) and fit params
       ``n``/``buckets``/``sample_size``/``epochs``/``lr``/``l2``.
       The verdict is a pure row-local function of the text under
       the RECORDED model, so extensions gate new batches
       identically to a fresh rebuild by construction; NULL text is
       dropped (NULL prob — same fate the heuristic gate deals it).
    1c. **published page filters** (``page_filters`` config, r13): the
       gated standalone page-quality operators as recorded,
       drop-accounted recipe tiers, applied in the FIXED order
       c4 → gopher → compression → lm (each optional; every tier
       drops rows it cannot judge — NULL text, unscoreable pages):

       - ``"c4"``: ``True`` or ``{"min_words", "min_lines",
         "rewrite"}`` — :func:`~.text.c4_line_filter` (Raffel 2020);
         drops C4-dropped pages, and with ``rewrite`` (default True,
         the paper's behavior) REPLACES ``col`` with the surviving
         lines, so every later stage (decontamination, dedup, the
         written set) sees the cleaned page.
       - ``"gopher"``: ``True`` — require
         :func:`~.text.gopher_quality_flags` ``passes_gopher``
         (Rae 2021 A1.1).
       - ``"compression"``: ``{"min_ratio_e4" and/or "max_ratio_e4",
         optional "level"}`` — bound
         :func:`~.text.compression_ratio`'s deflate signal. The
         manifest records the zlib runtime version; extensions REFUSE
         under a different zlib build (compressed sizes differ across
         builds, so the gate would silently drift).
       - ``"lm"``: ``{"max_avg_nll_e6", optional "smoothing"
         ("laplace" default, "kn" — interpolated Kneser–Ney via
         :func:`~.text.lm_score_kn`, same two snapshot tables — or
         "backoff", r14: stupid backoff at an explicit ``"order"``
         2..8 via :func:`~.text.lm_score_backoff_n`, the actual CCNet
         5-gram gate, with optional ``"alpha"`` and store-prune
         ``"min_count"``), and exactly one model source: for the
         bigram smoothings ("unigrams" + "bigrams" count DataFrames)
         or ("vocab_store" + "bigram_store" persisted-store paths);
         for backoff ("counts": order→DataFrame for every order
         1..order) or ("vocab_store" + "ngram_stores": order→path for
         every order 2..order)}`` — drop pages whose
         :func:`~.text.lm_score` ``avg_nll_e6`` under the REFERENCE
         model exceeds the bound (the CCNet shape, Wenzek 2020). The
         resolved counts are SNAPSHOTTED into ``out_path/lm_model/``
         at build (higher orders as order-tagged ``ngrams_<k>``
         slices) and the manifest records that directory — extensions
         and rebuilds score under the identical frozen counts even if
         the source store keeps ingesting (same reasoning as the
         recorded qcls/dsir models, for a model too big to inline).

       All gates are row-local predicates (no join back on ids —
       the shared ``_*_frame`` builders in :mod:`~.text` append the
       verdict columns in place) except lm, whose count-table join is
       inherent; it runs LAST over the already-thinned pool.
    2. **decontamination**: drop rows sharing any ``contamination_ngram``
       word n-gram with ``benchmark`` (:func:`~.text.decontaminate` —
       broadcast-probe; the corpus never shuffles).
    3. **dedup**: :func:`~.dedup.dedup_corpus` (exact tier → MinHash/
       LSH → connected components → keep policy; pass
       ``keep_quality_col`` for best-quality-survives).
    3b. **semantic dedup** (``semantic_dedup`` config, r10): SemDeDup
       over an embedding column AFTER the lexical tiers
       (:func:`~.similarity.semdedup`). Config keys: ``vec_col``
       (default "embedding"), ``threshold`` (0.95), ``keep``
       ("min_id"; "farthest" allowed but then extension equality is
       not guaranteed), ``k`` (16, used only when training),
       ``max_cell_size`` (optional Σcell² guard), ``centroids``
       (optional pretrained k×dim list — when absent, k-means trains
       here and the RESULT is recorded in the manifest config, making
       the clustering part of the recipe: extensions and fresh
       rebuilds dedup under the IDENTICAL cell structure). NULL
       embeddings pass through unexamined (the module's
       null-preservation contract).
    3c. **image perceptual dedup** (``image_dedup`` config, r14): keep
       one image per perceptual near-duplicate cluster over an opaque
       binary ``payload_col``, AFTER the lexical and semantic tiers —
       dHash/pHash fingerprints (:mod:`~.multimodal`), Hamming
       pigeonhole pairing, connected components, keep policy (cluster-
       min id, or best ``quality_col``). Config keys: ``payload_col``
       (default "payload"), ``method`` ("dhash" default or "phash"),
       ``hash_size`` (8), ``max_distance`` (3), ``quality_col``
       (optional), ``allow_fake`` (True). Every payload is decoded
       exactly ONCE: the fingerprints persist into
       ``out_path/image_fps/`` (the fingerprint-store layout of
       :mod:`~..streaming.incremental`) and the pairing, the manifest,
       and every later extension's cross probe read 8-byte
       fingerprints from those files. The manifest records the build's
       pixel-tier availability (Pillow or not); extensions refuse a
       runtime that would hash the same payload differently — the
       zlib-pin reasoning. NULL payloads pass through unexamined.
    3c'. **video perceptual dedup** (``video_dedup`` config, r14): the
       image tier one fan-out up — every payload frame-samples and
       hashes ONCE (``every_n`` stride) into a per-frame fingerprint
       store (``out_path/video_fps``: ``(doc_id, frame_idx, fp)``);
       two videos cluster when at least ``min_matching_frames`` frame
       pairs land within ``max_distance``
       (:func:`~.multimodal.video_neardup_pairs` semantics); same
       keep policies, pixel-tier pin, extension cross-probe, and
       component spread as the image tier.
    3c''. **audio perceptual dedup** (``audio_dedup`` config, r14):
       the video tier's audio twin over Haitsma–Kalker band-sign
       sub-fingerprints (:func:`~.multimodal.audio_fingerprint`:
       stdlib WAV parse → per-frame ``n_bands``-bit packed longs;
       non-WAV payloads fall to the digest chain at the same width) —
       fingerprints persist into ``out_path/audio_fps``, clips
       cluster on ≥ ``min_matching_frames`` frame pairs within
       ``max_distance``; same keep policies, extension cross-probe,
       and component spread, with a NUMPY-version pin standing in for
       the pixel pin (FFT reduction order is the tier's codec).
    3d. **DSIR selection** (``dsir`` config, r11): importance-resample
       toward a target domain (:func:`~.text.dsir_select` semantics,
       Xie et al. 2023) AFTER the dedup tiers and BEFORE mixture —
       the mixture's solved proportions are the output composition
       contract, so selecting after it would distort them; DSIR
       narrows the pool toward the target, then mixture balances
       composition within the selection. Config keys: ``n_select``
       (required), exactly ONE of ``target`` (a domain-sample
       DataFrame with column ``col``, consumed at build — the fitted
       model is what gets recorded) or ``model`` (a pretrained
       :func:`~.text.dsir_fit` dict), optional ``salt`` (default
       ``"{salt}:dsir"`` — a redraw knob independent of the shuffle),
       and fit params ``n``/``buckets``/``smoothing`` (honored only
       when fitting here). When fitting at build, the raw-corpus
       distribution q is estimated from the INPUT ``docs`` (the
       paper's shape — importance weights are raw-vs-target; one
       narrow extra scan of the input, never a re-run of the recipe
       prefix). The RECORDED model scores every later extension batch,
       so extension and fresh-union-rebuild-under-the-recorded-model
       select identically; per-doc weights are stored in the premix
       pool (``__dsir_logw_e6``), so extensions score only the batch.
    4. **mixture**: :func:`~.sampling.target_mixture` solves per-stratum
       keep rates for ``mixture`` shares over ``strata_col`` (largest
       feasible output, no upsampling) and hash-downsamples.
       Alternatively ``temperature`` (r13, mutually exclusive with
       ``mixture``): :func:`~.sampling.temperature_mixture` —
       α-tempered shares ``(n_i/N)^alpha`` (the XLM-R/mT5 multilingual
       rebalancing) instead of an explicit target dict; the alpha is
       recorded in the manifest and extensions RE-SOLVE the tempered
       shares from the grown pool under the original salt, exactly the
       mixture path's snapshot-versioned re-derive.
    5. **chunk/pack**: with ``chunk_tokens``, documents become
       fixed-size token chunks; with ``pack_budget`` additionally,
       each chunk gets a ``pack_id`` under the token budget
       (:mod:`~.chunking`).
    6. **shuffle + shard + write**: deterministic global permutation,
       shard membership a pure function of ``(salt, id)``, written as
       ``out_path/data/shard=K/`` parquet.

    The manifest records the configuration, the written row/token
    totals and per-shard row counts (all computed from ONE scan of the
    written files), and — only under ``audit=True`` — the per-stage
    survivor counts (each costs one extra evaluation of the pipeline
    prefix; leave off at scale unless you need the drop curve).

    Returns the manifest dict.
    """
    if mixture is not None and strata_col is None:
        raise ValueError("mixture targets require strata_col")
    if temperature is not None:
        if mixture is not None:
            raise ValueError(
                "mixture and temperature are two solvers for the same "
                "stage — pass one"
            )
        if strata_col is None:
            raise ValueError("temperature rebalancing requires strata_col")
        if not (0.0 < float(temperature) <= 1.0):
            raise ValueError(
                f"temperature must be in (0, 1] (got {temperature})"
            )
        temperature = float(temperature)
    if pack_budget is not None and chunk_tokens is None:
        raise ValueError("pack_budget requires chunk_tokens")
    sem: dict | None = None
    if semantic_dedup is not None:
        sem = dict(semantic_dedup)
        sem.setdefault("vec_col", "embedding")
        sem.setdefault("threshold", 0.95)
        sem.setdefault("keep", "min_id")
        sem.setdefault("k", 16)
        if sem["vec_col"] not in docs.columns:
            raise ValueError(
                f"semantic_dedup.vec_col {sem['vec_col']!r} not in the "
                f"input columns {docs.columns}"
            )
        if sem.get("centroids") is not None and not sem["centroids"]:
            raise ValueError(
                "semantic_dedup.centroids is empty — pass a real k×dim "
                "list or omit it to train at build time"
            )
    qcls_cfg: dict | None = None
    qcls_pos: DataFrame | None = None
    qcls_neg: DataFrame | None = None
    if qcls is not None:
        src = dict(qcls)
        qcls_pos = src.pop("pos", None)
        qcls_neg = src.pop("neg", None)
        min_prob = src.get("min_prob")
        if (
            not isinstance(min_prob, (int, float))
            or isinstance(min_prob, bool)
            or not (0.0 < float(min_prob) < 1.0)
        ):
            raise ValueError(
                "qcls.min_prob must be a probability strictly inside "
                "(0, 1) — 0 keeps everything, 1 keeps nothing"
            )
        qmodel = src.get("model")
        if (qcls_pos is None) == (qmodel is None):
            raise ValueError(
                "qcls config needs exactly ONE of 'pos' (a curated "
                "positive-sample DataFrame, fit at build) or 'model' "
                "(a pretrained quality_classifier_fit dict)"
            )
        if qmodel is not None:
            if qmodel.get("format") != "spark-graft-qcls/v1":
                raise ValueError(
                    "qcls.model is not a quality_classifier_fit model "
                    f"(format={qmodel.get('format')!r})"
                )
            if qcls_neg is not None:
                raise ValueError(
                    "qcls.neg is only meaningful when fitting at build "
                    "('pos' given) — a pretrained model ignores it; "
                    "drop one"
                )
        # the recorded shape: only what extensions/rebuilds need —
        # fit params live inside the model once fitted
        qcls_cfg = {"min_prob": float(min_prob), "model": qmodel}
        qcls_fit_params = {
            k: src[k]
            for k in ("n", "buckets", "sample_size", "epochs", "lr", "l2")
            if k in src
        }
    pf_cfg: dict | None = None
    pf_lm_inputs = None
    if page_filters is not None:
        pf_cfg, pf_lm_inputs = _norm_page_filters(page_filters)
    img_cfg: dict | None = None
    if image_dedup is not None:
        img_cfg = _norm_image_dedup(image_dedup, docs)
    vid_cfg: dict | None = None
    if video_dedup is not None:
        vid_cfg = _norm_video_dedup(video_dedup, docs)
    aud_cfg: dict | None = None
    if audio_dedup is not None:
        aud_cfg = _norm_audio_dedup(audio_dedup, docs)
    dsir_cfg: dict | None = None
    dsir_target: DataFrame | None = None
    if dsir is not None:
        src = dict(dsir)
        dsir_target = src.pop("target", None)
        n_sel = src.get("n_select")
        if not isinstance(n_sel, int) or isinstance(n_sel, bool) \
                or n_sel <= 0:
            raise ValueError("dsir.n_select must be a positive int")
        model = src.get("model")
        if (dsir_target is None) == (model is None):
            raise ValueError(
                "dsir config needs exactly ONE of 'target' (a domain-"
                "sample DataFrame, fit at build) or 'model' (a "
                "pretrained dsir_fit dict)"
            )
        if model is not None and (
            model.get("format") != "spark-graft-dsir/v1"
        ):
            raise ValueError(
                "dsir.model is not a dsir_fit model (format="
                f"{model.get('format')!r})"
            )
        # the recorded shape: only what extensions/rebuilds need —
        # fit params live inside the model once fitted
        dsir_cfg = {
            "n_select": n_sel,
            "salt": str(src.get("salt", f"{salt}:dsir")),
            "model": model,
        }
        dsir_fit_params = {
            "n": int(src.get("n", 2)),
            "buckets": int(src.get("buckets", 10_000)),
            "smoothing": float(src.get("smoothing", 1.0)),
        }

    stages: list[tuple[str, int]] = []

    def _audit(name: str, frame: DataFrame) -> None:
        if audit:
            stages.append((name, frame.count()))

    cur = docs
    _audit("input", cur)
    if quality_filter:
        # row-local predicate, NOT a semi-join back onto ids: the
        # verdict is a pure function of the text, so joining would add
        # a corpus-sized shuffle for nothing (and silently key-drop
        # NULL-id rows)
        cur = cur.where(_passes_quality(col))
        _audit("quality", cur)
    if qcls_cfg is not None:
        from .text import _qcls_prob_udf, quality_classifier_fit

        if qcls_cfg["model"] is None:
            # negatives default to the RAW input (one bounded driver-
            # side sample fit, deterministic — the paper's positives-
            # vs-crawl shape); the FITTED model is what the manifest
            # records, so extensions and rebuilds gate identically
            qcls_cfg["model"] = quality_classifier_fit(
                qcls_pos,
                qcls_neg if qcls_neg is not None else docs,
                col=col,
                **qcls_fit_params,
            )
        # row-local predicate, same reasoning as the heuristic gate
        # above: the verdict is a pure function of (text, model), so
        # no join, no shuffle — only the text column crosses Arrow
        cur = cur.where(
            _qcls_prob_udf(qcls_cfg["model"])(F.col(col))
            >= F.lit(qcls_cfg["min_prob"])
        )
        _audit("qcls", cur)
    if pf_cfg is not None:
        lm_frames = None
        if pf_cfg.get("lm") is not None:
            # snapshot the resolved reference counts INSIDE the set and
            # score from the re-read snapshot — the build and every
            # later extension read the same frozen files, so the gate
            # cannot drift even if the source store keeps ingesting
            _write_lm_model(
                spark, out_path, pf_cfg["lm"]["model_dir"], pf_lm_inputs
            )
            lm_frames = _read_lm_model(spark, out_path, pf_cfg["lm"])
        cur = _apply_page_filters(cur, pf_cfg, col, id_col, lm_frames, _audit)
    if benchmark is not None:
        cur = decontaminate(
            cur, benchmark, n=contamination_ngram, col=col, id_col=id_col
        )
        _audit("decontaminated", cur)
    if dedup:
        cur = dedup_corpus(
            cur,
            threshold=dedup_threshold,
            quality_col=keep_quality_col,
            col=col,
            id_col=id_col,
        )
        _audit("deduped", cur)
    if sem is not None:
        cur = _semantic_stage(cur, sem, id_col, train_if_needed=True)
        _audit("semantic_dedup", cur)
    if img_cfg is not None:
        cur = _image_dedup_stage(
            cur, img_cfg,
            f"{out_path.rstrip('/')}/{img_cfg['store_dir']}",
            id_col, _audit, batch_id=0,
        )
    if vid_cfg is not None:
        cur = _video_dedup_stage(
            cur, vid_cfg,
            f"{out_path.rstrip('/')}/{vid_cfg['store_dir']}",
            id_col, _audit, batch_id=0,
        )
    if aud_cfg is not None:
        cur = _audio_dedup_stage(
            cur, aud_cfg,
            f"{out_path.rstrip('/')}/{aud_cfg['store_dir']}",
            id_col, _audit, batch_id=0,
        )
    if dsir_cfg is not None:
        from .text import _dsir_logw_udf, dsir_fit

        if dsir_cfg["model"] is None:
            # q from the RAW input (one narrow extra scan of docs —
            # the paper fits raw-vs-target; fitting on the survivor
            # pipeline instead would re-run the whole recipe prefix
            # for a distribution estimate a raw scan serves equally)
            dsir_cfg["model"] = dsir_fit(
                docs, dsir_target, col=col, **dsir_fit_params
            )
        # per-doc weight attached as a COLUMN (scalar Arrow UDF — no
        # join, no shuffle, only the text column crosses the
        # boundary); it rides into the premix pool so extensions
        # score only their batch
        cur = cur.withColumn(
            "__dsir_logw_e6", _dsir_logw_udf(dsir_cfg["model"])(F.col(col))
        )
    rates: dict[str, float] = {}
    premix_schema: str | None = None
    if mixture is not None or temperature is not None \
            or dsir_cfg is not None:
        if chunk_tokens is None:
            # r9 (mixture) / r11 (dsir): persist the PRE-selection
            # survivor pool — the extension state that makes globally-
            # selected sets incrementally extendable. Fresh-build-on-
            # union equality needs the rows the mixture/selection
            # DROPPED (a mixture rate that rises re-admits them; a new
            # batch can evict a previously-selected doc from the DSIR
            # top-n), so the pool is the re-derive universe; it also
            # de-duplicates work here — the expensive
            # quality/decont/dedup prefix is evaluated once into the
            # pool and the kept write reads the pool files instead of
            # re-running the pipeline. Chunked sets refuse extension
            # outright, so a pool there would be dead storage — they
            # keep the pre-r9 single-plan build.
            premix_path = f"{out_path.rstrip('/')}/premix"
            if sem is not None:
                # the pool carries the recipe clustering's cell id so
                # extensions probe stored cells instead of re-assigning
                # the whole pool per batch
                cur = _with_semcell(cur, sem, id_col)
            cur.write.mode("errorifexists").parquet(premix_path)
            premix_schema = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in cur.schema.fields
            )
            cur = spark.read.schema(premix_schema).parquet(premix_path)
        if dsir_cfg is not None:
            cur = _dsir_select_stage(cur, dsir_cfg, id_col)
            _audit("dsir", cur)
        # pool/stage helper columns never reach the written set
        cur = cur.drop("__semcell", "__dsir_logw_e6")
        if mixture is not None:
            cur, rates = target_mixture(
                cur, mixture, strata_col, key=id_col, salt=f"{salt}:mix"
            )
            _audit("mixture", cur)
        elif temperature is not None:
            cur, rates = temperature_mixture(
                cur, strata_col, alpha=temperature, key=id_col,
                salt=f"{salt}:mix",
            )
            _audit("mixture", cur)

    unit = "documents"
    pack_mode = False
    persisted: DataFrame | None = None
    if chunk_tokens is not None:
        chunks = chunk_documents(
            cur, chunk_tokens=chunk_tokens, col=col, id_col=id_col
        )
        if pack_budget is not None:
            # Persist the chunked corpus for the duration of the write:
            # the pack subtree (reads 3 small columns) and the join that
            # re-attaches chunk_text both consume it, and Spark does NOT
            # dedupe the two differently-projected subplans — without
            # the cache the tokenize+explode (the dominant cost) would
            # run twice inside the single write job. Shipping chunk_text
            # through pack_sequences' Arrow batches instead would put
            # the full text of a shard in one pandas frame — the wrong
            # trade at scale, where only (id, idx, n_tokens) may enter
            # Python. Released in the finally below once the write is
            # the last consumer standing.
            persisted = chunks.persist()
            packed = pack_sequences(
                persisted,
                budget_tokens=pack_budget,
                num_shards=num_shards,
                id_col=id_col,
                tokens_col="n_tokens",
            )
            chunks = persisted.join(
                packed.select(id_col, "chunk_idx", "pack_id"),
                [id_col, "chunk_idx"],
            )
            unit = "packed_chunks"
            pack_mode = True
            # the shuffle UNIT is the PACK: every chunk of a pack must
            # land in the same shard, contiguously, or a loader
            # striding shards can never assemble a complete sequence
            cur = chunks.withColumn(
                "__unit_id", F.col("pack_id").cast("string")
            )
        else:
            unit = "chunks"
            # standalone chunks: each chunk is its own training row,
            # so per-chunk keys give the desired full interleave
            cur = chunks.withColumn(
                "__unit_id",
                F.concat_ws(
                    "#", F.col(id_col).cast("string"), F.col("chunk_idx")
                ),
            )
        shuffle_key = "__unit_id"
    else:
        shuffle_key = id_col

    # In pack mode the shuffle key (the pack id) is SHARED by every
    # chunk of a pack — tiebreak_cols pins the intra-pack order
    # (doc, chunk) INSIDE the shuffle operator, so parquet row order is
    # deterministic and each pack reads back contiguous and in
    # sequence, without this module re-deriving the operator's private
    # ordering hash.
    out = deterministic_shuffle(
        cur,
        key=shuffle_key,
        salt=f"{salt}:shuffle",
        num_shards=num_shards,
        shard_col="shard",
        tiebreak_cols=[id_col, "chunk_idx"] if pack_mode else None,
    )
    out = out.drop("__unit_id")

    data_path = f"{out_path.rstrip('/')}/data"
    try:
        out.write.mode("errorifexists").partitionBy("shard").parquet(
            data_path
        )
    finally:
        if persisted is not None:
            persisted.unpersist()

    # All written-output statistics from ONE scan of the files — the
    # write is the only full evaluation the default config pays.
    per_shard, shingleable, canaries = _written_shard_stats(
        spark,
        data_path,
        out.schema,
        F.col("n_tokens").cast("long")
        if chunk_tokens is not None
        else _n_tokens(col).cast("long"),
        shingle_col=col if chunk_tokens is None else None,
        id_col=id_col,
    )
    manifest = {
        "format": "spark-graft-training-set/v1",
        "unit": unit,
        "salt": salt,
        # pointer to the live data version: mixture extensions publish
        # re-derived kept sets as fresh data_v* dirs and flip this
        # (snapshot isolation for concurrent readers); plain builds
        # and append-only extensions keep "data"
        "data_dir": "data",
        # recorded schema: read_training_set reads under it, so an
        # all-rows-filtered (zero-part-file) output stays loadable
        "schema": ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in out.schema.fields
        ),
        "num_shards": num_shards,
        "rows": sum(s["rows"] for s in per_shard.values()),
        "tokens": sum(s["tokens"] for s in per_shard.values()),
        "shards": per_shard,
        # ingest epochs so far: extend_training_set increments this.
        # After any extension a shard holds part files from several
        # write jobs with NO cross-file order guarantee — loaders
        # needing the global permutation use
        # read_training_set(ordered=True).
        "epochs": 1,
        # docs able to produce word shingles (document units only):
        # the prebuilt-index staleness guard compares against this
        # instead of re-scanning the corpus text
        "shingleable": shingleable,
        "config": {
            "col": col,
            "id_col": id_col,
            "quality_filter": quality_filter,
            "qcls": qcls_cfg,
            "page_filters": pf_cfg,
            "decontaminated": benchmark is not None,
            "contamination_ngram": (
                contamination_ngram if benchmark is not None else None
            ),
            "dedup": dedup,
            "dedup_threshold": dedup_threshold if dedup else None,
            "keep_quality_col": keep_quality_col,
            "semantic_dedup": sem,
            "image_dedup": img_cfg,
            "video_dedup": vid_cfg,
            "audio_dedup": aud_cfg,
            "dsir": dsir_cfg,
            "mixture": mixture,
            "temperature": temperature,
            "strata_col": strata_col,
            "solved_mixture_rates": rates or None,
            "premix_schema": premix_schema,
            "chunk_tokens": chunk_tokens,
            "pack_budget": pack_budget,
        },
    }
    if canaries is not None and _json_safe_ids(canaries):
        # the min AND max shingleable id: the staleness guard rebuilds
        # both docs' band rows, so a mis-parameterized maintenance
        # append (band rows for NEW docs built with different
        # num_hashes/n) is caught from the max-id end on monotone-id
        # corpora — min(id) alone always samples the oldest, provably
        # correct epoch
        manifest["canary_ids"] = canaries
    if audit:
        manifest["stage_rows"] = dict(stages)
    _write_manifest(spark, f"{out_path.rstrip('/')}/manifest.json", manifest)
    return manifest


def _norm_page_filters(page_filters: dict):
    """Validate the ``page_filters`` config and split it into the
    RECORDED shape (JSON-safe, what the manifest stores and every
    extension replays) plus the build-only lm model inputs (frames or
    store paths, consumed at build into the snapshot). Raises
    ``ValueError`` on anything ambiguous — a half-validated filter
    config recorded in a manifest would gate every future extension
    wrong."""
    import zlib

    src = dict(page_filters)
    unknown = set(src) - {"c4", "gopher", "lm", "compression"}
    if unknown:
        raise ValueError(
            f"unknown page_filters keys {sorted(unknown)}; known: "
            "c4, gopher, lm, compression"
        )
    cfg: dict = {}
    c4 = src.get("c4")
    if c4:
        c4 = {} if c4 is True else dict(c4)
        extra = set(c4) - {"min_words", "min_lines", "rewrite"}
        if extra:
            raise ValueError(f"unknown page_filters.c4 keys {sorted(extra)}")
        mw = int(c4.get("min_words", 5))
        ml = int(c4.get("min_lines", 3))
        if mw < 1 or ml < 1:
            raise ValueError(
                "page_filters.c4 thresholds must be positive "
                f"(min_words={mw}, min_lines={ml})"
            )
        cfg["c4"] = {
            "min_words": mw,
            "min_lines": ml,
            "rewrite": bool(c4.get("rewrite", True)),
        }
    if src.get("gopher"):
        if src["gopher"] is not True:
            raise ValueError(
                "page_filters.gopher takes no parameters — pass True "
                "(the published thresholds are the rule set)"
            )
        cfg["gopher"] = True
    comp = src.get("compression")
    if comp:
        comp = dict(comp)
        extra = set(comp) - {"min_ratio_e4", "max_ratio_e4", "level"}
        if extra:
            raise ValueError(
                f"unknown page_filters.compression keys {sorted(extra)}"
            )
        lo = comp.get("min_ratio_e4")
        hi = comp.get("max_ratio_e4")
        if lo is None and hi is None:
            raise ValueError(
                "page_filters.compression needs min_ratio_e4 and/or "
                "max_ratio_e4 — with neither it gates nothing"
            )
        lo = None if lo is None else int(lo)
        hi = None if hi is None else int(hi)
        if lo is not None and hi is not None and lo > hi:
            raise ValueError(
                f"page_filters.compression bounds cross ({lo} > {hi})"
            )
        cfg["compression"] = {
            "min_ratio_e4": lo,
            "max_ratio_e4": hi,
            "level": int(comp.get("level", 6)),
            # compressed sizes differ across zlib builds — record the
            # build's, so extensions refuse instead of silently
            # gating differently (the pin-one-codec-per-fleet rule)
            "zlib_version": zlib.ZLIB_RUNTIME_VERSION,
        }
    lm_inputs = None
    lm = src.get("lm")
    if lm:
        lm = dict(lm)
        extra = set(lm) - {
            "max_avg_nll_e6", "unigrams", "bigrams",
            "vocab_store", "bigram_store", "smoothing",
            "order", "alpha", "counts", "ngram_stores", "min_count",
        }
        if extra:
            raise ValueError(f"unknown page_filters.lm keys {sorted(extra)}")
        smoothing = str(lm.get("smoothing", "laplace"))
        if smoothing not in ("laplace", "kn", "backoff"):
            raise ValueError(
                "page_filters.lm.smoothing must be 'laplace' "
                "(lm_score), 'kn' (lm_score_kn — same two snapshot "
                "tables), or 'backoff' (lm_score_backoff_n at the "
                f"configured order) (got {smoothing!r})"
            )
        thr = lm.get("max_avg_nll_e6")
        if (
            not isinstance(thr, int) or isinstance(thr, bool) or thr <= 0
        ):
            raise ValueError(
                "page_filters.lm.max_avg_nll_e6 must be a positive "
                "int (per-pair negative log-likelihood in 1e-6 nats)"
            )
        if smoothing == "backoff":
            for k in ("unigrams", "bigrams", "bigram_store"):
                if k in lm:
                    raise ValueError(
                        f"page_filters.lm.{k} is the bigram-model "
                        "source — backoff smoothing takes 'counts' "
                        "(order->DataFrame) or 'vocab_store'+"
                        "'ngram_stores' (order->path)"
                    )
            order = lm.get("order")
            if (
                not isinstance(order, int) or isinstance(order, bool)
                or not (2 <= order <= 8)
            ):
                raise ValueError(
                    "page_filters.lm backoff smoothing needs an "
                    "explicit 'order' in 2..8 (the CCNet gate is 5); "
                    f"got {order!r}"
                )
            alpha = float(lm.get("alpha", 0.4))
            if not (0.0 < alpha <= 1.0):
                raise ValueError(
                    f"page_filters.lm.alpha must be in (0, 1] "
                    f"(got {alpha})"
                )
            min_count = int(lm.get("min_count", 1))
            if min_count < 1:
                raise ValueError(
                    f"page_filters.lm.min_count must be >= 1 "
                    f"(got {min_count})"
                )
            frames_n = "counts" in lm
            stores_n = ("vocab_store" in lm) or ("ngram_stores" in lm)
            if frames_n == stores_n:
                raise ValueError(
                    "page_filters.lm backoff needs exactly ONE model "
                    "source: 'counts' (order->count DataFrames, all "
                    "orders 1..order), or 'vocab_store'+'ngram_stores' "
                    "(order->store path for every order 2..order)"
                )
            if frames_n:
                counts = dict(lm["counts"])
                missing = [k for k in range(1, order + 1)
                           if k not in counts]
                if missing:
                    raise ValueError(
                        "page_filters.lm.counts must cover every "
                        f"order 1..{order} (a page filter scores "
                        "under a REFERENCE model — nothing self-fits "
                        f"here); missing {missing}"
                    )
                lm_inputs = ("frames_n", counts, order)
            else:
                if not lm.get("vocab_store") or not lm.get("ngram_stores"):
                    raise ValueError(
                        "page_filters.lm backoff store mode needs "
                        "BOTH vocab_store and ngram_stores"
                    )
                npaths = {int(k): str(v)
                          for k, v in dict(lm["ngram_stores"]).items()}
                missing = [k for k in range(2, order + 1)
                           if k not in npaths]
                if missing:
                    raise ValueError(
                        "page_filters.lm.ngram_stores must cover every "
                        f"order 2..{order}; missing {missing}"
                    )
                lm_inputs = (
                    "stores_n", str(lm["vocab_store"]), npaths,
                    order, min_count,
                )
            cfg["lm"] = {
                "max_avg_nll_e6": int(thr),
                "model_dir": "lm_model",
                "smoothing": smoothing,
                "order": int(order),
                "alpha": alpha,
                "min_count": min_count,
            }
            return cfg, lm_inputs
        for k in ("counts", "ngram_stores", "order", "alpha", "min_count"):
            if k in lm:
                raise ValueError(
                    f"page_filters.lm.{k} is backoff-smoothing "
                    "configuration — the laplace/kn gates are "
                    "bigram-model filters (pass smoothing='backoff' "
                    "for higher orders)"
                )
        frames = ("unigrams" in lm) or ("bigrams" in lm)
        stores = ("vocab_store" in lm) or ("bigram_store" in lm)
        if frames == stores:
            raise ValueError(
                "page_filters.lm needs exactly ONE model source: "
                "unigrams+bigrams count DataFrames, or "
                "vocab_store+bigram_store persisted-store paths"
            )
        if frames:
            if lm.get("unigrams") is None or lm.get("bigrams") is None:
                raise ValueError(
                    "page_filters.lm frames mode needs BOTH unigrams "
                    "and bigrams"
                )
            lm_inputs = ("frames", lm["unigrams"], lm["bigrams"])
        else:
            if not lm.get("vocab_store") or not lm.get("bigram_store"):
                raise ValueError(
                    "page_filters.lm store mode needs BOTH vocab_store "
                    "and bigram_store paths"
                )
            lm_inputs = (
                "stores", str(lm["vocab_store"]), str(lm["bigram_store"])
            )
        cfg["lm"] = {
            "max_avg_nll_e6": int(thr),
            "model_dir": "lm_model",
            "smoothing": smoothing,
        }
    if not cfg:
        raise ValueError(
            "page_filters configured but selects no filter — drop the "
            "argument or enable at least one of c4/gopher/lm/compression"
        )
    return cfg, lm_inputs


def _write_lm_model(
    spark: SparkSession, out_path: str, model_dir: str, lm_inputs
) -> None:
    """Freeze the lm filter's reference counts inside the training set
    (``out_path/<model_dir>/{unigrams,bigrams}`` parquet): resolve the
    build inputs — direct count frames, or the persisted stores'
    current merged counts — and write the snapshot every later scoring
    pass (build AND extensions) reads. Vocabulary-bounded, one narrow
    copy; ``errorifexists`` so a racing second build fails loudly."""
    kind = lm_inputs[0]
    base = out_path.rstrip("/")
    if kind in ("frames_n", "stores_n"):
        # backoff model at arbitrary order (r14): unigrams under the
        # bigram layout's (token, count) contract, each higher order
        # as ngrams_<k>/(w1..wk, n_gram) — the order-tagged store
        # slices, frozen exactly like the bigram tables
        from ..streaming.incremental import read_ngram_counts_any

        if kind == "frames_n":
            counts, order = dict(lm_inputs[1]), int(lm_inputs[2])
            uni = counts[1]
            if "w1" in uni.columns and "token" not in uni.columns:
                uni = uni.select(
                    F.col("w1").alias("token"),
                    F.col("n_gram").alias("count"),
                )
            tabs = {
                k: counts[k].select(
                    *[
                        F.col(f"w{i + 1}").cast("string").alias(f"w{i + 1}")
                        for i in range(k)
                    ],
                    F.col("n_gram").cast("bigint").alias("n_gram"),
                )
                for k in range(2, order + 1)
            }
        else:
            vpath, npaths, order, min_count = (
                str(lm_inputs[1]), dict(lm_inputs[2]),
                int(lm_inputs[3]), int(lm_inputs[4]),
            )
            from ..streaming.incremental import (
                _read_vocab_store_raw,
                _vocab_store_flag,
                read_vocab_store,
            )

            if not _vocab_store_flag(_read_vocab_store_raw(spark, vpath)):
                raise ValueError(
                    "page_filters.lm needs a LOWERCASE vocab store "
                    "(the scorer lowercases; a case-sensitive store "
                    "would score every token as out-of-vocabulary)"
                )
            uni = read_vocab_store(spark, vpath)
            tabs = {
                k: read_ngram_counts_any(
                    spark, npaths[k], k, min_count=min_count
                )
                for k in range(2, order + 1)
            }
        uni.select(
            F.col("token").cast("string").alias("token"),
            F.col("count").cast("bigint").alias("count"),
        ).write.mode("errorifexists").parquet(
            f"{base}/{model_dir}/unigrams"
        )
        for k, tab in tabs.items():
            tab.write.mode("errorifexists").parquet(
                f"{base}/{model_dir}/ngrams_{k}"
            )
        return
    if kind == "frames":
        uni = lm_inputs[1].select(
            F.col("token").cast("string").alias("token"),
            F.col("count").cast("bigint").alias("count"),
        )
        big = lm_inputs[2].select(
            F.col("w1").cast("string").alias("w1"),
            F.col("w2").cast("string").alias("w2"),
            F.col("n_pair").cast("bigint").alias("n_pair"),
        )
    else:
        from ..streaming.incremental import (
            _read_vocab_store_raw,
            _vocab_store_flag,
            read_bigram_store,
            read_vocab_store,
        )

        if not _vocab_store_flag(_read_vocab_store_raw(spark, lm_inputs[1])):
            raise ValueError(
                "page_filters.lm needs a LOWERCASE vocab store (the "
                "scorer lowercases; a case-sensitive store would score "
                "every token as out-of-vocabulary)"
            )
        uni = read_vocab_store(spark, lm_inputs[1])
        big = read_bigram_store(spark, lm_inputs[2])
    base = out_path.rstrip("/")
    uni.write.mode("errorifexists").parquet(f"{base}/{model_dir}/unigrams")
    big.write.mode("errorifexists").parquet(f"{base}/{model_dir}/bigrams")


def _read_lm_model(
    spark: SparkSession, out_path: str, lm_cfg: dict
):
    """The frozen lm-model snapshot, under explicit schemas (an
    empty-but-valid snapshot must stay readable). Bigram smoothings
    (laplace/kn) return ``(unigrams, bigrams)``; backoff returns the
    ``{order: counts}`` dict :func:`~.text.lm_score_backoff_n`
    consumes, read from the order-tagged ``ngrams_<k>`` snapshot
    directories."""
    d = f"{out_path.rstrip('/')}/{lm_cfg.get('model_dir', 'lm_model')}"
    uni = spark.read.schema("token string, count bigint").parquet(
        f"{d}/unigrams"
    )
    if lm_cfg.get("smoothing") == "backoff":
        order = int(lm_cfg["order"])
        counts: dict[int, DataFrame] = {1: uni}
        for k in range(2, order + 1):
            schema = ", ".join(
                [f"w{i + 1} string" for i in range(k)] + ["n_gram bigint"]
            )
            counts[k] = spark.read.schema(schema).parquet(
                f"{d}/ngrams_{k}"
            )
        return counts
    big = spark.read.schema(
        "w1 string, w2 string, n_pair bigint"
    ).parquet(f"{d}/bigrams")
    return uni, big


def _apply_page_filters(
    cur: DataFrame,
    pf: dict,
    col: str,
    id_col: str,
    lm_frames,
    _audit,
) -> DataFrame:
    """The recipe's published page-filter tier (stage 1c), shared
    VERBATIM by build and extension so the two cannot drift. Fixed
    order c4 → gopher → compression → lm: the row-local gates thin the
    pool before the one join-shaped gate. Every tier drops rows it
    cannot judge (NULL text, unmeasurable or unscoreable pages) — the
    same fate the heuristic and learned quality gates deal NULLs."""
    from .text import (
        _c4_frame,
        _compression_frame,
        _gopher_frame,
        lm_score,
    )

    c4 = pf.get("c4")
    if c4:
        g = _c4_frame(cur, col, int(c4["min_words"]), int(c4["min_lines"]))
        g = g.where(~F.col("__c4_dropped"))
        if c4.get("rewrite", True):
            g = g.withColumn(col, F.col("__c4_kept_text"))
        cur = g.drop(*[c for c in g.columns if c.startswith("__c4_")])
        _audit("c4", cur)
    if pf.get("gopher"):
        g = _gopher_frame(cur, col)
        cur = g.where(F.col("__gq_passes")).drop(
            *[c for c in g.columns if c.startswith("__gq_")]
        )
        _audit("gopher", cur)
    comp = pf.get("compression")
    if comp:
        g = _compression_frame(cur, col, int(comp["level"]))
        cond = None
        if comp.get("min_ratio_e4") is not None:
            cond = F.col("__cr_e4") >= F.lit(int(comp["min_ratio_e4"]))
        if comp.get("max_ratio_e4") is not None:
            hi = F.col("__cr_e4") <= F.lit(int(comp["max_ratio_e4"]))
            cond = hi if cond is None else (cond & hi)
        cur = g.where(cond).drop(
            *[c for c in g.columns if c.startswith("__cr_")]
        )
        _audit("compression", cur)
    lm = pf.get("lm")
    if lm:
        from .text import lm_score_backoff_n, lm_score_kn

        if lm.get("smoothing", "laplace") == "backoff":
            # higher-order gate (r14): stupid backoff at the recorded
            # order under the frozen order-tagged count snapshot — the
            # actual CCNet 5-gram shape as a recipe tier
            scored = lm_score_backoff_n(
                cur, order=int(lm["order"]), col=col, id_col=id_col,
                counts=lm_frames, alpha=float(lm.get("alpha", 0.4)),
            )
        else:
            uni, big = lm_frames
            scorer = (
                lm_score_kn
                if lm.get("smoothing", "laplace") == "kn"
                else lm_score
            )
            scored = scorer(
                cur, col=col, id_col=id_col, unigrams=uni, bigrams=big
            )
        ok = (
            scored.where(
                F.col("avg_nll_e6") <= F.lit(int(lm["max_avg_nll_e6"]))
            )
            .select(id_col)
        )
        # the one join-shaped gate (scores group per doc id) — NULL
        # scores (NULL text, < 2 tokens) never match, so unscoreable
        # pages drop, consistent with the other tiers
        cur = cur.join(ok, id_col, "left_semi")
        _audit("lm_filter", cur)
    return cur


def _page_filter_ext_inputs(spark: SparkSession, base: str, cfg: dict):
    """Extension-side resolution of the recorded page filters: refuse
    a zlib build different from the one the compression bounds were
    recorded under (compressed sizes differ across builds — the gate
    would silently drift), and load the frozen lm-model snapshot.
    Returns the lm frames (or None)."""
    import zlib

    pf = cfg.get("page_filters")
    if not pf:
        return None
    comp = pf.get("compression")
    if comp and comp.get("zlib_version") != zlib.ZLIB_RUNTIME_VERSION:
        raise ValueError(
            "this set's compression page filter was recorded under "
            f"zlib {comp.get('zlib_version')!r} but this runtime has "
            f"{zlib.ZLIB_RUNTIME_VERSION!r} — compressed sizes differ "
            "across zlib builds, so extending here would gate "
            "differently than the build. Pin the original zlib build "
            "or re-materialize under this one"
        )
    if pf.get("lm") is not None:
        return _read_lm_model(spark, base, pf["lm"])
    return None


def _norm_image_dedup(image_dedup: dict, docs: DataFrame) -> dict:
    """Validate the ``image_dedup`` config into its RECORDED shape
    (JSON-safe — what the manifest stores and every extension
    replays). Raises ``ValueError`` on anything ambiguous; records the
    build's pixel-tier availability (Pillow present or not) so
    extensions refuse a runtime that would hash the same payload to
    different bits (the pin-one-codec-per-fleet rule, same reasoning
    as the compression filter's zlib pin)."""
    from .multimodal import _pillow

    src = dict(image_dedup)
    unknown = set(src) - {
        "payload_col", "method", "hash_size", "max_distance",
        "quality_col", "allow_fake",
    }
    if unknown:
        raise ValueError(
            f"unknown image_dedup keys {sorted(unknown)}; known: "
            "payload_col, method, hash_size, max_distance, "
            "quality_col, allow_fake"
        )
    pcol = str(src.get("payload_col", "payload"))
    if pcol not in docs.columns:
        raise ValueError(
            f"image_dedup.payload_col {pcol!r} not in the input "
            f"columns {docs.columns}"
        )
    method = str(src.get("method", "dhash"))
    if method not in ("dhash", "phash"):
        raise ValueError(
            f"image_dedup.method must be 'dhash' or 'phash' "
            f"(got {method!r})"
        )
    hs = int(src.get("hash_size", 8))
    if not (2 <= hs <= 8):
        raise ValueError(
            f"image_dedup.hash_size must be in 2..8 (got {hs}): "
            "hash_size² bits must pack into one 64-bit long"
        )
    md = int(src.get("max_distance", 3))
    if md < 1:
        raise ValueError(
            f"image_dedup.max_distance must be >= 1 (got {md}) — 0 "
            "would be exact dedup, which the lexical tier already does"
        )
    if hs * hs < md + 1:
        raise ValueError(
            f"image_dedup: cannot split {hs * hs} fingerprint bits "
            f"into {md + 1} pigeonhole segments — lower max_distance "
            "or raise hash_size"
        )
    qcol = src.get("quality_col")
    if qcol is not None:
        qcol = str(qcol)
        if qcol not in docs.columns:
            raise ValueError(
                f"image_dedup.quality_col {qcol!r} not in the input "
                f"columns {docs.columns}"
            )
    return {
        "payload_col": pcol,
        "method": method,
        "hash_size": hs,
        "max_distance": md,
        "quality_col": qcol,
        "allow_fake": bool(src.get("allow_fake", True)),
        "store_dir": "image_fps",
        "pillow": _pillow() is not None,
    }


def _media_store_ext_inputs(
    spark: SparkSession, base: str, cfg: dict, key: str, default_dir: str
):
    """Extension-side resolution of a recorded media-dedup tier
    (image or video): the fingerprint store written by the build (and
    every prior extension) must exist — without it the cross probe
    would silently admit near-dups of the whole corpus. Returns the
    store path (or None when the set has no such tier)."""
    media = cfg.get(key)
    if not media:
        return None
    from ..sources.txn import _fs, _hpath

    rel = media.get("store_dir", default_dir)
    jvm, fs = _fs(spark, base)
    if not fs.exists(_hpath(jvm, base, rel)):
        raise ValueError(
            f"this set's {key} fingerprint store ({base}/{rel}) "
            "is missing — it is written at build and appended by every "
            "extension; without it new batches cannot be probed "
            "against the corpus fingerprints. Re-materialize the set"
        )
    return f"{base}/{rel}"


def _image_ext_inputs(spark: SparkSession, base: str, cfg: dict):
    return _media_store_ext_inputs(
        spark, base, cfg, "image_dedup", "image_fps"
    )


def _video_ext_inputs(spark: SparkSession, base: str, cfg: dict):
    return _media_store_ext_inputs(
        spark, base, cfg, "video_dedup", "video_fps"
    )


def _audio_ext_inputs(spark: SparkSession, base: str, cfg: dict):
    return _media_store_ext_inputs(
        spark, base, cfg, "audio_dedup", "audio_fps"
    )


def _norm_video_dedup(video_dedup: dict, docs: DataFrame) -> dict:
    """Validate the ``video_dedup`` config into its RECORDED JSON-safe
    shape — the :func:`_norm_image_dedup` twin plus the frame-level
    knobs (``every_n`` sampling stride, ``min_matching_frames`` pair
    threshold)."""
    from .multimodal import _pillow

    src = dict(video_dedup)
    unknown = set(src) - {
        "payload_col", "method", "hash_size", "max_distance",
        "quality_col", "allow_fake", "every_n", "min_matching_frames",
    }
    if unknown:
        raise ValueError(
            f"unknown video_dedup keys {sorted(unknown)}; known: "
            "payload_col, method, hash_size, max_distance, "
            "quality_col, allow_fake, every_n, min_matching_frames"
        )
    pcol = str(src.get("payload_col", "payload"))
    if pcol not in docs.columns:
        raise ValueError(
            f"video_dedup.payload_col {pcol!r} not in the input "
            f"columns {docs.columns}"
        )
    method = str(src.get("method", "dhash"))
    if method not in ("dhash", "phash"):
        raise ValueError(
            f"video_dedup.method must be 'dhash' or 'phash' "
            f"(got {method!r})"
        )
    hs = int(src.get("hash_size", 8))
    if not (2 <= hs <= 8):
        raise ValueError(
            f"video_dedup.hash_size must be in 2..8 (got {hs})"
        )
    md = int(src.get("max_distance", 3))
    if md < 1:
        raise ValueError(
            f"video_dedup.max_distance must be >= 1 (got {md})"
        )
    if hs * hs < md + 1:
        raise ValueError(
            f"video_dedup: cannot split {hs * hs} fingerprint bits "
            f"into {md + 1} pigeonhole segments"
        )
    every_n = int(src.get("every_n", 2))
    if every_n < 1:
        raise ValueError(
            f"video_dedup.every_n must be >= 1 (got {every_n})"
        )
    mmf = int(src.get("min_matching_frames", 1))
    if mmf < 1:
        raise ValueError(
            f"video_dedup.min_matching_frames must be >= 1 (got {mmf})"
        )
    qcol = src.get("quality_col")
    if qcol is not None:
        qcol = str(qcol)
        if qcol not in docs.columns:
            raise ValueError(
                f"video_dedup.quality_col {qcol!r} not in the input "
                f"columns {docs.columns}"
            )
    return {
        "payload_col": pcol,
        "method": method,
        "hash_size": hs,
        "max_distance": md,
        "every_n": every_n,
        "min_matching_frames": mmf,
        "quality_col": qcol,
        "allow_fake": bool(src.get("allow_fake", True)),
        "store_dir": "video_fps",
        "pillow": _pillow() is not None,
    }


def _pixel_tier_guard(media: dict, key: str) -> None:
    """Refuse a runtime whose pixel-tier availability differs from the
    one the fingerprints were computed under — the zlib-pin reasoning
    applied to pixels (bilinear vs integer-NN resample hash the same
    payload to different bits), shared by the image and video tiers."""
    from .multimodal import _pillow

    if bool(media.get("pillow")) != (_pillow() is not None):
        raise ValueError(
            f"this set's {key} fingerprints were computed with "
            f"Pillow {'present' if media.get('pillow') else 'absent'} "
            "but this runtime has it "
            f"{'present' if _pillow() is not None else 'absent'} — "
            "the pixel tiers hash the same payload to different bits, "
            "so extending here would band incomparable fingerprints. "
            "Pin one codec tier per fleet, or re-materialize under "
            "this one"
        )


def _norm_audio_dedup(audio_dedup: dict, docs: DataFrame) -> dict:
    """Validate the ``audio_dedup`` config into its RECORDED JSON-safe
    shape — the :func:`_norm_video_dedup` twin for Haitsma–Kalker
    frame fingerprints (``frame_size``/``hop`` analysis grid,
    ``n_bands`` sub-fingerprint width, ``min_matching_frames`` pair
    threshold). Records the numpy version the WAV-tier FFT ran under
    (:func:`_audio_tier_guard`)."""
    import numpy as np

    src = dict(audio_dedup)
    unknown = set(src) - {
        "payload_col", "frame_size", "hop", "n_bands", "max_distance",
        "quality_col", "allow_fake", "min_matching_frames",
    }
    if unknown:
        raise ValueError(
            f"unknown audio_dedup keys {sorted(unknown)}; known: "
            "payload_col, frame_size, hop, n_bands, max_distance, "
            "quality_col, allow_fake, min_matching_frames"
        )
    pcol = str(src.get("payload_col", "payload"))
    if pcol not in docs.columns:
        raise ValueError(
            f"audio_dedup.payload_col {pcol!r} not in the input "
            f"columns {docs.columns}"
        )
    fs = int(src.get("frame_size", 2048))
    if fs < 16:
        raise ValueError(
            f"audio_dedup.frame_size must be >= 16 (got {fs})"
        )
    hop = int(src.get("hop", 1024))
    if hop < 1:
        raise ValueError(f"audio_dedup.hop must be >= 1 (got {hop})")
    nb = int(src.get("n_bands", 32))
    if not (2 <= nb <= 60):
        raise ValueError(
            f"audio_dedup.n_bands must be in 2..60 (got {nb})"
        )
    md = int(src.get("max_distance", 3))
    if md < 1:
        raise ValueError(
            f"audio_dedup.max_distance must be >= 1 (got {md})"
        )
    if nb < md + 1:
        raise ValueError(
            f"audio_dedup: cannot split {nb} fingerprint bits into "
            f"{md + 1} pigeonhole segments"
        )
    mmf = int(src.get("min_matching_frames", 1))
    if mmf < 1:
        raise ValueError(
            f"audio_dedup.min_matching_frames must be >= 1 (got {mmf})"
        )
    qcol = src.get("quality_col")
    if qcol is not None:
        qcol = str(qcol)
        if qcol not in docs.columns:
            raise ValueError(
                f"audio_dedup.quality_col {qcol!r} not in the input "
                f"columns {docs.columns}"
            )
    return {
        "payload_col": pcol,
        "frame_size": fs,
        "hop": hop,
        "n_bands": nb,
        "max_distance": md,
        "min_matching_frames": mmf,
        "quality_col": qcol,
        "allow_fake": bool(src.get("allow_fake", True)),
        "store_dir": "audio_fps",
        "numpy": str(np.__version__),
    }


def _audio_tier_guard(aud: dict) -> None:
    """Refuse a runtime whose numpy build differs from the one the
    WAV-tier fingerprints were computed under — the zlib/pixel-pin
    reasoning applied to FFT arithmetic: a different numpy may
    reorder the rfft's floating-point reductions, flipping borderline
    band-sign bits on the SAME payload, which would band incomparable
    fingerprints across epochs."""
    import numpy as np

    if str(aud.get("numpy")) != str(np.__version__):
        raise ValueError(
            f"this set's audio_dedup fingerprints were computed under "
            f"numpy {aud.get('numpy')} but this runtime has "
            f"{np.__version__} — FFT reduction order may differ, "
            "flipping borderline band-sign bits. Pin one numpy per "
            "fleet, or re-materialize under this one"
        )


def _video_dedup_stage(
    cur: DataFrame,
    vid: dict,
    store_path: str,
    id_col: str,
    _audit,
    batch_id: int,
    universe: DataFrame | None = None,
) -> DataFrame:
    """The recipe's VIDEO near-dup tier (r14) — the
    :func:`_image_dedup_stage` twin one fan-out up, shared verbatim by
    build and extension. Decode-once: every row reaching the stage has
    its payload frame-sampled and hashed exactly ONCE (one fused Arrow
    pass), and the per-frame fingerprints persist as this epoch's
    store fragment (``(doc_id, frame_idx, fp)``) — pairing, keep
    policy, and every later extension's cross probe read 8-byte frame
    fingerprints from the files. Two videos pair when at least
    ``min_matching_frames`` frame pairs land within ``max_distance``
    (:func:`~.multimodal.video_neardup_pairs` semantics over the
    stored fingerprints); contacts restrict to universe members and
    spread through within-batch components exactly like the image
    tier."""
    from .multimodal import dhash_media, phash_media, sample_frames

    _pixel_tier_guard(vid, "video_dedup")
    pcol = vid["payload_col"]
    method = vid["method"]
    hs = int(vid["hash_size"])
    bits = hs * hs
    hasher = dhash_media if method == "dhash" else phash_media
    id_type = cur.schema[id_col].dataType

    def _vidof(c: str):
        # the frame index is the LAST '#' segment; everything before
        # it is the video id, restored to its original type
        return F.expr(
            f"substring({c}, 1, length({c}) - "
            f"length(substring_index({c}, '#', -1)) - 1)"
        ).cast(id_type)

    frames = sample_frames(
        cur.where(F.col(pcol).isNotNull()), every_n=int(vid["every_n"]),
        id_col=id_col, payload_col=pcol,
        allow_fake=bool(vid.get("allow_fake", True)),
    )
    keyed = frames.select(
        F.concat_ws(
            "#", F.col(id_col).cast("string"), F.col("frame_idx")
        ).alias("__fkey"),
        F.col("frame_payload"),
    )
    fps = hasher(
        keyed, hash_size=hs, id_col="__fkey",
        payload_col="frame_payload",
        allow_fake=bool(vid.get("allow_fake", True)),
    ).withColumnRenamed(method, "fp")
    frag_rows = fps.select(
        _vidof("__fkey").alias("doc_id"),
        F.expr(
            "CAST(substring_index(__fkey, '#', -1) AS INT)"
        ).alias("frame_idx"),
        "fp",
    )
    return _frame_store_dedup_core(
        cur, vid, store_path, id_col, _audit, batch_id, universe,
        frag_rows, bits=bits,
        method_tag=f"{method}@{int(vid['every_n'])}", tier="video",
    )


def _frame_store_dedup_core(
    cur: DataFrame,
    cfg: dict,
    store_path: str,
    id_col: str,
    _audit,
    batch_id: int,
    universe: DataFrame | None,
    frag_rows: DataFrame,
    bits: int,
    method_tag: str,
    tier: str,
) -> DataFrame:
    """Shared tail of the frame-fingerprint recipe tiers (video and
    audio, r14): persist this epoch's ``(doc_id, frame_idx, fp)``
    store fragment (the ONE action that touches payload bytes),
    pigeonhole-pair the fragment's frames within the batch, cluster
    media on ≥ ``min_matching_frames`` matching frames, apply the
    keep policy, and — on extension — cross-probe the store's PRIOR
    fragments with contacts restricted to universe members and
    spread through the within-batch components. One implementation,
    so the two modalities (and build vs extension) cannot drift."""
    from ..streaming.incremental import write_fingerprint_fragment
    from .dedup import (
        dedup_clusters,
        hamming_pairs,
        hamming_probe,
        keep_best_per_cluster,
    )

    md = int(cfg["max_distance"])
    mmf = int(cfg["min_matching_frames"])
    spark = cur.sparkSession
    id_type = cur.schema[id_col].dataType

    def _midof(c: str):
        # the frame index is the LAST '#' segment; everything before
        # it is the media id, restored to its original type
        return F.expr(
            f"substring({c}, 1, length({c}) - "
            f"length(substring_index({c}, '#', -1)) - 1)"
        ).cast(id_type)

    write_fingerprint_fragment(
        frag_rows, store_path, batch_id, method_tag,
        int(cfg.get("hash_size", cfg.get("n_bands"))),
        extra=("frame_idx",),
    )
    store = spark.read.schema(
        f"`doc_id` {id_type.simpleString()}, `frame_idx` int, "
        "`fp` bigint, `__method` string, `__hash_size` int, "
        "`batch_id` int"
    ).parquet(store_path)

    def _fkeys(dfx: DataFrame) -> DataFrame:
        return dfx.select(
            F.concat_ws(
                "#", F.col("doc_id").cast("string"), F.col("frame_idx")
            ).alias("__fkey"),
            "fp",
        )

    def _mpairs(frame_pairs: DataFrame) -> DataFrame:
        va, vb = _midof("doc_a"), _midof("doc_b")
        return (
            frame_pairs.select(
                F.least(va, vb).alias("doc_a"),
                F.greatest(va, vb).alias("doc_b"),
                (va != vb).alias("__cross"),
            )
            .where(F.col("__cross"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= F.lit(mmf))
            .select("doc_a", "doc_b")
        )

    frag = store.where(F.col("batch_id") == F.lit(int(batch_id)))
    fpairs = hamming_pairs(
        _fkeys(frag), max_distance=md, id_col="__fkey", fp_col="fp",
        bits=bits,
    )
    comps = dedup_clusters(_mpairs(fpairs), id_col=id_col)
    if cfg.get("quality_col"):
        cur = keep_best_per_cluster(cur, comps, cfg["quality_col"], id_col)
    else:
        losers_in = comps.where(
            F.col(id_col) != F.col("cluster_id")
        ).select(id_col)
        cur = cur.join(losers_in, id_col, "left_anti")
    _audit(
        f"{tier}_dedup" if universe is None else f"{tier}_within_batch",
        cur,
    )
    if universe is None:
        return cur
    corpus_fps = store.where(F.col("batch_id") < F.lit(int(batch_id)))
    cross_f = hamming_probe(
        _fkeys(frag), _fkeys(corpus_fps), max_distance=md,
        id_col="__fkey", fp_col="fp", bits=bits,
    )
    # probe output: doc_a = batch frame key, doc_b = corpus frame key;
    # aggregate frame matches per (batch media, corpus media) pair
    cpairs = (
        cross_f.select(
            _midof("doc_a").alias("__bv"), _midof("doc_b").alias("__cv")
        )
        .groupBy("__bv", "__cv")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= F.lit(mmf))
    )
    ex_ids = universe.select(F.col(id_col).alias("__ex"))
    contacted = (
        cpairs.join(ex_ids, cpairs["__cv"] == F.col("__ex"), "left_semi")
        .select(F.col("__bv").alias(id_col))
        .distinct()
    )
    cl = comps.select(id_col, "cluster_id")
    bad_clusters = (
        cl.join(contacted, id_col, "left_semi")
        .select("cluster_id")
        .distinct()
    )
    spread = cl.join(bad_clusters, "cluster_id", "left_semi").select(id_col)
    losers = contacted.unionByName(spread).distinct()
    cur = cur.join(losers, id_col, "left_anti")
    _audit(f"cross_{tier}", cur)
    return cur


def _audio_dedup_stage(
    cur: DataFrame,
    aud: dict,
    store_path: str,
    id_col: str,
    _audit,
    batch_id: int,
    universe: DataFrame | None = None,
) -> DataFrame:
    """The recipe's AUDIO near-dup tier (r14) — the
    :func:`_video_dedup_stage` twin over Haitsma–Kalker band-sign
    sub-fingerprints (:func:`~.multimodal.audio_fingerprint`: stdlib
    WAV parse → per-frame packed longs; non-WAV payloads fall to the
    digest chain masked to the same ``n_bands`` width). Decode-once:
    every row reaching the stage has its payload fingerprinted
    exactly ONCE, the per-frame fingerprints persist as this epoch's
    ``audio_fps`` store fragment, and pairing / keep policy / every
    later extension's cross probe run off the stored longs through
    the shared :func:`_frame_store_dedup_core`."""
    from .multimodal import audio_fingerprint

    _audio_tier_guard(aud)
    pcol = aud["payload_col"]
    afps = audio_fingerprint(
        cur.where(F.col(pcol).isNotNull()),
        frame_size=int(aud["frame_size"]), hop=int(aud["hop"]),
        n_bands=int(aud["n_bands"]), id_col=id_col, payload_col=pcol,
        allow_fake=bool(aud.get("allow_fake", True)),
    )
    frag_rows = afps.select(
        F.col(id_col).alias("doc_id"), "frame_idx",
        F.col("afp").alias("fp"),
    )
    return _frame_store_dedup_core(
        cur, aud, store_path, id_col, _audit, batch_id, universe,
        frag_rows, bits=int(aud["n_bands"]),
        method_tag=f"hk:{int(aud['frame_size'])}:{int(aud['hop'])}",
        tier="audio",
    )


def _image_dedup_stage(
    cur: DataFrame,
    img: dict,
    store_path: str,
    id_col: str,
    _audit,
    batch_id: int,
    universe: DataFrame | None = None,
) -> DataFrame:
    """The recipe's image perceptual near-dup tier (r14), shared
    VERBATIM by build and extension so the two cannot drift.

    Decode-once contract: every row reaching this stage has its
    payload hashed exactly ONCE (one Arrow pass), and the fingerprints
    are persisted as this epoch's fragment of the set's fingerprint
    store BEFORE any pairing — the pairing, the keep policy, and every
    later extension's cross probe read 8-byte fingerprints from the
    store files; payload bytes never enter a join or a shuffle. The
    store may retain fingerprints of rows a later stage (or this keep
    policy) dropped — harmless: cross contacts are restricted to live
    universe members by the semi-join below, exactly the lexical cross
    tier's shape.

    Build (``universe=None``): within-corpus pairing
    (:func:`~.dedup.hamming_pairs` pigeonhole banding, never
    all-pairs) → connected components → keep policy (cluster-min id,
    or best ``quality_col`` — the RefinedWeb policy). NULL payloads
    pass through unexamined (the multimodal module's null-preservation
    contract).

    Extension (``universe`` given): within-batch pairing + keep policy
    as above, then the cross tier — batch fingerprints
    :func:`~.dedup.hamming_probe` the store's PRIOR fragments (batch
    side broadcasts; the corpus never re-decodes, never self-pairs),
    contacts are restricted to universe members (keep-first across
    epochs: the universe member always wins) and spread through the
    within-batch components (the r11 closure: a batch doc whose only
    corpus link runs through a within-batch loser still drops, as a
    fresh union build would fold the component).
    """
    from ..streaming.incremental import write_fingerprint_fragment
    from .dedup import (
        dedup_clusters,
        hamming_pairs,
        hamming_probe,
        keep_best_per_cluster,
    )
    from .multimodal import dhash_media, phash_media

    _pixel_tier_guard(img, "image_dedup")
    pcol = img["payload_col"]
    method = img["method"]
    hs = int(img["hash_size"])
    bits = hs * hs
    md = int(img["max_distance"])
    hasher = dhash_media if method == "dhash" else phash_media
    spark = cur.sparkSession
    fps = (
        hasher(
            cur.where(F.col(pcol).isNotNull()),
            hash_size=hs, id_col=id_col, payload_col=pcol,
            allow_fake=bool(img.get("allow_fake", True)),
        )
        .withColumnRenamed(id_col, "doc_id")
        .withColumnRenamed(method, "fp")
    )
    # the ONE action that touches payload bytes for this epoch
    write_fingerprint_fragment(fps, store_path, batch_id, method, hs)
    id_type = cur.schema[id_col].dataType.simpleString()
    store = spark.read.schema(
        f"`doc_id` {id_type}, `fp` bigint, `__method` string, "
        "`__hash_size` int, `batch_id` int"
    ).parquet(store_path)
    frag = store.where(F.col("batch_id") == F.lit(int(batch_id))).select(
        "doc_id", "fp"
    )
    pairs = hamming_pairs(
        frag, max_distance=md, id_col="doc_id", fp_col="fp", bits=bits
    )
    comps = dedup_clusters(pairs, id_col=id_col)
    if img.get("quality_col"):
        cur = keep_best_per_cluster(cur, comps, img["quality_col"], id_col)
    else:
        losers_in = comps.where(
            F.col(id_col) != F.col("cluster_id")
        ).select(id_col)
        cur = cur.join(losers_in, id_col, "left_anti")
    _audit("image_dedup" if universe is None else "image_within_batch", cur)
    if universe is None:
        return cur
    corpus_fps = store.where(F.col("batch_id") < F.lit(int(batch_id))).select(
        "doc_id", "fp"
    )
    cross = hamming_probe(
        frag, corpus_fps, max_distance=md,
        id_col="doc_id", fp_col="fp", bits=bits,
    )
    ex_ids = universe.select(F.col(id_col).alias("__ex"))
    contacted = (
        cross.join(ex_ids, cross["doc_b"] == F.col("__ex"), "left_semi")
        .select(F.col("doc_a").alias(id_col))
        .distinct()
    )
    cl = comps.select(id_col, "cluster_id")
    bad_clusters = (
        cl.join(contacted, id_col, "left_semi")
        .select("cluster_id")
        .distinct()
    )
    spread = cl.join(bad_clusters, "cluster_id", "left_semi").select(id_col)
    losers = contacted.unionByName(spread).distinct()
    cur = cur.join(losers, id_col, "left_anti")
    _audit("cross_image", cur)
    return cur


def _semantic_stage(
    cur: DataFrame, sem: dict, id_col: str, train_if_needed: bool = False
) -> DataFrame:
    """The recipe's semantic-dedup stage: SemDeDup under a FIXED
    clustering (:func:`~.similarity.semdedup` with the recorded
    centroids — recorded at build so extensions and fresh rebuilds
    dedup under the identical cell structure). With
    ``train_if_needed`` (the build path) absent centroids are trained
    here via :func:`~.similarity.kmeans` and written back into ``sem``
    for the manifest. NULL embeddings pass through unexamined."""
    return _semantic_stage_parts(cur, sem, id_col, train_if_needed)[0]


def _semantic_stage_parts(
    cur: DataFrame, sem: dict, id_col: str, train_if_needed: bool = False
) -> tuple[DataFrame, DataFrame]:
    """:func:`_semantic_stage` plus the within-stage near-dup
    COMPONENTS (``(id_col, cluster_id, ...)`` over the verified
    in-cell pairs — r11): the extension cross tier spreads a corpus
    contact through these components, so a batch doc that chains to
    the corpus only THROUGH a within-batch semantic loser drops
    exactly as a fresh union build folds the component."""
    from .similarity import _semdedup_parts, kmeans

    v = sem["vec_col"]
    nn = cur.where(F.col(v).isNotNull())
    nulls = cur.where(F.col(v).isNull())
    if sem.get("centroids") is None:
        if not train_if_needed:
            raise ValueError(
                "recorded semantic_dedup config has no centroids — the "
                "set predates the r10 semantic tier; re-materialize"
            )
        dim = sem.get("dim")
        if dim is None:
            row = nn.select(v).first()
            if row is None:
                # recording empty centroids would silently disable the
                # semantic tier for EVERY later extension (batches with
                # real embeddings would skip it while a fresh rebuild
                # of the union would train and dedup) — refuse loudly
                raise ValueError(
                    "semantic_dedup is configured but the corpus has "
                    "no non-NULL embeddings to train the clustering "
                    "on — drop the config, or pass pretrained "
                    "centroids"
                )
            dim = len(row[0])
        _, cents = kmeans(
            nn, k=int(sem["k"]), dim=int(dim),
            seed=int(sem.get("seed", 7)), id_col=id_col, vec_col=v,
        )
        sem["centroids"] = cents
    if not sem["centroids"]:
        # a manifest written by the pre-r10 build could record [] for
        # an all-NULL-embedding corpus; silently skipping here would
        # diverge from a fresh union rebuild (which trains and dedups)
        raise ValueError(
            "recorded semantic_dedup centroids are EMPTY (a pre-fix "
            "build over a corpus with no embeddings) — re-materialize "
            "the set; extensions must not silently skip the semantic "
            "tier"
        )
    kept, comps = _semdedup_parts(
        nn, threshold=float(sem["threshold"]), keep=sem["keep"],
        id_col=id_col, vec_col=v, centroids=sem["centroids"],
        max_cell_size=sem.get("max_cell_size"),
    )
    return kept.unionByName(nulls), comps


def _dsir_select_stage(
    cur: DataFrame, dsir_cfg: dict, id_col: str
) -> DataFrame:
    """The recipe's DSIR selection stage: importance-resample
    ``n_select`` rows toward the recorded model's target domain via
    Gumbel-top-k over the stored ``__dsir_logw_e6`` weights — exactly
    :func:`~.text.dsir_select`'s mechanism (same fixed-point→double
    conversion, same :func:`~.sampling.weighted_sample_k`, same
    hash-of-(salt,id) noise), so the standalone operator and the
    recipe stage cannot drift and a given (pool, model, salt) selects
    identically whether reached by extension or by a fresh rebuild.
    NULL-weight (NULL-text) and NULL-id rows are never selected;
    fewer than ``n_select`` survivors select them all. One
    distributed TakeOrdered — no global sort."""
    from .sampling import weighted_sample_k

    scored = cur.withColumn(
        "__logw", F.col("__dsir_logw_e6").cast("double") / F.lit(1e6)
    )
    return weighted_sample_k(
        scored, "__logw", int(dsir_cfg["n_select"]), key=id_col,
        salt=str(dsir_cfg["salt"]),
    ).drop("__logw")


def _with_semcell(cur: DataFrame, sem: dict, id_col: str) -> DataFrame:
    """Attach the recipe clustering's cell id as ``__semcell`` (NULL
    for NULL embeddings) — persisted in the premix pool so mixture
    extensions probe the pool's cells without re-assigning the whole
    pool per batch."""
    from .similarity import assign_cells

    if not sem.get("centroids"):
        return cur.withColumn("__semcell", F.lit(None).cast("bigint"))
    v = sem["vec_col"]
    cells = assign_cells(
        cur.where(F.col(v).isNotNull()), sem["centroids"],
        id_col=id_col, vec_col=v,
    ).select(id_col, F.col("cluster").alias("__semcell"))
    return cur.join(cells, id_col, "left")


def _shingleable_cond(col: str, id_col: str):
    """THE definition of "this doc participates in a prebuilt LSH
    index": a non-NULL id (band rows key on the id, and the guard's
    ``countDistinct`` on the index side drops NULL groups — a NULL-id
    doc can never be covered, so it must not be counted as coverable)
    plus enough non-null text for ≥1 word shingle — the implicit
    indexable condition of ``dedup._shingle_hashes`` (trim → split on
    whitespace → ≥ ``DEFAULT_SHINGLE_N`` tokens). One shared helper so
    the manifest-side count and the staleness guard's fallback scan can
    never drift from each other."""
    from .dedup import DEFAULT_SHINGLE_N
    from .text import tokens

    return (
        F.col(id_col).isNotNull()
        & F.col(col).isNotNull()
        & (F.size(tokens(col)) >= F.lit(DEFAULT_SHINGLE_N))
    )


def _json_safe_ids(vals) -> bool:
    """True when every value survives a manifest JSON round-trip with
    identity (int/float/str — not bool, whose Spark cast-to-string
    differs, and not date/timestamp objects, which json.dumps rejects).
    Canary ids failing this are simply not recorded; the guard's
    fallback scan recomputes them live."""
    return all(
        isinstance(v, (int, float, str)) and not isinstance(v, bool)
        for v in vals
    )


def _written_shard_stats(
    spark, data_path, schema, tok_col, shingle_col=None,
    id_col: str = "doc_id",
) -> tuple[dict, int | None, list | None]:
    """Per-shard {rows, tokens} from ONE scan of the written files —
    the files are the source of truth (same principle as the txn
    manifest). The explicit schema keeps an all-rows-filtered output
    readable (zero part files would fail schema inference); string
    shard keys so the manifest equals its own JSON round-trip.

    With ``shingle_col``, the SAME scan also totals the docs that can
    produce word 3-shingles (:func:`_shingleable_cond`) and captures
    the min/max shingleable id — recorded in the manifest so the
    prebuilt-index staleness guard is a metadata compare with known
    canary ids, not a second corpus text scan per extension."""
    written = (
        spark.read.schema(schema)
        .option("basePath", data_path)
        .parquet(data_path)
    )
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(tok_col).alias("tokens"),
    ]
    if shingle_col is not None:
        cond = _shingleable_cond(shingle_col, id_col)
        aggs.append(F.sum(cond.cast("long")).alias("sh"))
        aggs.append(F.min(F.when(cond, F.col(id_col))).alias("cmn"))
        aggs.append(F.max(F.when(cond, F.col(id_col))).alias("cmx"))
    shard_rows = written.groupBy("shard").agg(*aggs).collect()
    per_shard = {
        str(int(r["shard"])): {"rows": r["rows"], "tokens": r["tokens"] or 0}
        for r in shard_rows
    }
    if shingle_col is None:
        return per_shard, None, None
    mns = [r["cmn"] for r in shard_rows if r["cmn"] is not None]
    mxs = [r["cmx"] for r in shard_rows if r["cmx"] is not None]
    # zero shingleable docs record an EMPTY canary list (a valid,
    # cheap metadata answer) — None would force the guard's fallback
    # text scan on every future extension
    canaries = [min(mns), max(mxs)] if mns else []
    return per_shard, int(sum(r["sh"] or 0 for r in shard_rows)), canaries


def extend_training_set(
    spark: SparkSession,
    new_docs: DataFrame,
    out_path: str,
    *,
    benchmark: DataFrame | None = None,
    index: DataFrame | None = None,
    audit: bool = False,
    allow_interleaved_ids: bool = False,
) -> dict:
    """Incrementally grow a materialized training set: run the SAME
    recipe the set was built with over ``new_docs`` only, dedup the
    survivors against the EXISTING corpus, and append — the existing
    100 TB never re-processes to add a day of data.

    The recipe (quality gate, decontamination n-gram, dedup threshold
    + keep policy, salt, shard count) comes from the manifest, so an
    extension cannot drift from the original build. Stages:

    1. **insert-if-absent by id**: rows whose id already exists in the
       set are skipped (the ``txn_append`` contract) — re-running the
       same extension after a partial failure appends nothing twice.
    2. **quality / page filters / decontamination**: per the recorded
       config — the learned (qcls) and published page-filter tiers
       replay under the RECORDED models/thresholds (the lm filter
       reads the frozen ``lm_model`` snapshot; compression bounds
       refuse a different zlib build). A set built with
       decontamination REQUIRES ``benchmark`` here (silent skip would
       contaminate); a set built without REFUSES one
       (half-decontaminated corpora are recipe drift).
    3. **within-batch dedup**: :func:`~.dedup.dedup_corpus` at the
       recorded threshold/keep policy.
    4. **cross dedup, new vs existing — the scale-critical step**: the
       existing corpus is scanned ONCE for content hashes (exact tier
       anti-join; existing always wins) and probed via
       :func:`~.dedup.minhash_lsh_probe` (new batch broadcast — the
       corpus never shuffles and is never self-paired again). Pass a
       prebuilt ``index`` (:func:`~.dedup.build_lsh_index` output)
       so daily probes never re-shingle the corpus either; without
       it the band index is rebuilt from the corpus text each call —
       one full-corpus hashing pass. The index MUST cover the
       current corpus including prior extensions (rebuild or append
       band rows after each one) — a staleness guard compares its
       coverage against the live snapshot and refuses a stale or
       differently-banded index rather than silently admitting
       near-dups of recently appended docs.
    4a'. **media tiers (``image_dedup`` / ``video_dedup`` sets,
       r14)**: the batch's payloads hash ONCE into the set's
       fingerprint store (``out_path/image_fps`` per-payload;
       ``out_path/video_fps`` per-frame), dedup within the batch,
       then cross-probe the store's prior fragments — the corpus is
       never re-decoded; contacts spread through within-batch
       components like the lexical/semantic closures. Refuses a
       runtime whose pixel tier differs from the recorded one
       (Pillow presence).
    4b. **global re-derive (mixture and/or DSIR sets)**: batch
       survivors append to the premix pool — DSIR-configured sets
       score them under the RECORDED model first (only the batch is
       ever scored; pool rows carry their stored weight) — then the
       global stages (DSIR Gumbel-top-n selection, per-stratum
       mixture rates) re-derive the kept set from the grown pool
       under the original salts and publish it as a fresh snapshot
       version (see :func:`_extend_pooled`).
    5. **shuffle + append**: the same ``salt`` makes shard membership
       the SAME pure function of id as the original build; new rows
       append into their shards. Shard MEMBERSHIP stays exact, but a
       shard directory now holds part files from several write jobs
       and parquet gives no cross-file order guarantee — a loader
       needing the exact global permutation uses
       ``read_training_set(..., ordered=True)``, which re-derives the
       shuffle hash (a pure function of salt and id) and restores the
       permutation a single-shot build of the same rows would produce.

    Restrictions (all raise ``ValueError``): chunked/packed sets
    (their stored unit is a derived row; chunk-level incremental dedup
    would change recipe semantics) re-materialize instead.
    ``new_docs`` must match the recorded schema in names AND types (a
    type-drifted batch would append parquet files unreadable under the
    recorded schema), and ids must be non-NULL and batch-unique (a
    NULL id can never equi-match the insert-if-absent anti-join,
    silently breaking idempotence). Under the min-id dedup keep
    policy, batch rows surviving the within-batch stages must order
    AFTER every existing id — the condition under which extension
    (existing copy wins) and a fresh union build (group-minimum id
    wins) agree for every duplicate group whose members are visible
    in the kept/pool universe; an interleaved batch is refused unless
    ``allow_interleaved_ids=True`` asserts it shares no duplicate
    groups with the corpus. (Inherent residual, documented at the
    check: a fresh union build can also link groups THROUGH docs a
    previous epoch dropped — chains no survivor-only check can see;
    same-batch LEXICAL chains are handled — cross contacts spread
    through the within-batch components.)

    Single-writer: a best-effort ``_extend.lock`` marker (atomic
    create) rejects concurrent extensions of the same set — two
    racing append jobs would otherwise BOTH see the pre-append
    snapshot and double-append. A crash leaves the lock behind;
    delete it after confirming no extension is running (the error
    says so).

    Manifest update: stats recomputed from one scan of the written
    files; the previous manifest survives as ``manifest.json.bak``.
    If the publish rename fails mid-replacement the previous manifest
    is restored from ``.bak`` automatically; only if THAT restore
    also fails are ``.bak`` + the staged tmp left for manual recovery.

    Returns the new manifest plus ``appended_rows``.
    """
    base = out_path.rstrip("/")
    # fail a typo'd / nonexistent path BEFORE taking the lock —
    # createNewFile would otherwise create the directory chain as a
    # side effect of the guard itself
    from ..sources.txn import _fs, _hpath

    jvm, fs = _fs(spark, base)
    # .bak counts as present: during a concurrent _replace_manifest's
    # demote window the live name is briefly absent — that situation
    # must surface as the accurate lock-held error below, not as a
    # bogus "no training set"
    if not (
        fs.exists(_hpath(jvm, base, "manifest.json"))
        or fs.exists(_hpath(jvm, base, "manifest.json.bak"))
    ):
        raise FileNotFoundError(
            f"no training set at {base} (manifest.json missing)"
        )
    # lock BEFORE pinning the snapshot: reading first would let a
    # racing extension commit between our read and our lock — this
    # job would then append against a stale file listing (its
    # insert-if-absent and cross-dedup blind to the winner's rows)
    _acquire_extend_lock(spark, base)
    try:
        # With the lock held there is no concurrent demote window, so a
        # missing live manifest now means exactly one thing: a prior
        # _replace_manifest crashed after demoting AND its .bak restore
        # failed. Tell the operator the one-rename fix instead of dying
        # inside read_training_set with an opaque FileNotFoundException.
        if not fs.exists(_hpath(jvm, base, "manifest.json")):
            raise RuntimeError(
                f"{base}/manifest.json is missing but manifest.json.bak "
                "exists: a previous manifest replacement crashed "
                "mid-publish and could not self-restore. Rename "
                "manifest.json.bak back to manifest.json, then retry"
            )
        return _extend_locked(
            spark, new_docs, base, benchmark, index, audit,
            allow_interleaved_ids,
        )
    finally:
        _release_extend_lock(spark, base)


def _validate_batch(
    new_docs: DataFrame, reference: DataFrame, id_col: str, what: str
) -> None:
    """Shared batch validation of both extension paths: column names
    AND types against the recorded schema (append-mode parquet happily
    writes type-drifted files every later schema-pinned read chokes
    on), and id discipline — a NULL id never equi-matches the
    insert-if-absent anti-join (silent idempotence break) and a
    batch-internal collision would append two rows under one key. One
    tiny action over the batch, before anything is written."""
    expected = {
        f.name: f.dataType.simpleString()
        for f in reference.schema.fields
        # shard is the shuffle's own column; __semcell / __dsir_logw_e6
        # are the pool's stored recipe-stage outputs — none is input
        if f.name not in ("shard", "__semcell", "__dsir_logw_e6")
    }
    got = {f.name: f.dataType.simpleString() for f in new_docs.schema.fields}
    if got != expected:
        raise ValueError(
            f"new_docs columns {sorted(got.items())} != recorded "
            f"{what} {sorted(expected.items())}"
        )
    bad = (
        new_docs.groupBy(id_col)
        .count()
        .where(F.col(id_col).isNull() | (F.col("count") > 1))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"new_docs ids must be non-NULL and unique; offending "
            f"{id_col}: {bad[0][id_col]!r}"
        )


def _check_prebuilt_index(
    spark: SparkSession,
    universe: DataFrame,
    index: DataFrame,
    col: str,
    id_col: str,
    shingleable: int | None = None,
    canaries: list | None = None,
    expect_rows: int | None = None,
) -> None:
    """Staleness guard for a prebuilt LSH index against its dedup
    UNIVERSE (the kept set for plain extensions, the premix pool for
    mixture ones): an index that predates the last extension lacks
    band rows for appended docs, so their near-dups would be admitted
    SILENTLY. Coverage is a count compare; hash parameters
    (num_hashes / shingle n are invisible in bucket values) are
    verified by CANARIES — the min-id AND max-id shingleable docs'
    band rows are rebuilt from universe text and must match the
    indexed ones, so a mis-parameterized maintenance APPEND is caught
    from the newest-id end, not just the oldest. Coverage, banding,
    and the canaries' indexed rows come from ONE aggregation pass
    over the index.

    ``shingleable``/``canaries`` are the manifest fast path; they are
    trusted only while ``expect_rows`` matches the universe's cheap
    footer count (a crashed extension leaves files with pre-crash
    stats). Callers without recorded stats pass None and pay one
    narrow text scan of the universe."""
    from .dedup import build_lsh_index

    iid = "id" if "id" in index.columns else id_col
    if (
        shingleable is None
        or canaries is None
        or expect_rows is None
        or universe.count() != expect_rows
    ):
        row = (
            universe.where(_shingleable_cond(col, id_col))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(id_col).alias("mn"),
                F.max(id_col).alias("mx"),
            )
            .collect()[0]
        )
        shingleable = row["n"]
        canaries = [row["mn"], row["mx"]]
    # binary id columns collect as bytearray — unhashable, so it can
    # be neither set member nor dict key below; bytes keeps the value
    # and round-trips through F.lit/isin unchanged
    canaries = sorted(
        {
            bytes(c) if isinstance(c, bytearray) else c
            for c in canaries
            if c is not None
        },
        key=str,
    )
    stats = index.agg(
        F.countDistinct(F.col(iid)).alias("ids"),
        (F.max("band") + 1).alias("bands"),
        *[
            F.collect_list(
                F.when(
                    F.col(iid) == F.lit(c), F.struct("band", "bucket")
                )
            ).alias(f"__c{i}")
            for i, c in enumerate(canaries)
        ],
    ).collect()[0]
    if (stats["ids"] or 0) == 0 and shingleable == 0:
        return  # empty index over a shingle-less universe is fresh
    if stats["ids"] != shingleable or stats["bands"] != 8:
        raise ValueError(
            f"prebuilt index is stale or mis-parameterized: it "
            f"covers {stats['ids']} docs across {stats['bands']} "
            f"bands, but the current corpus has {shingleable} "
            f"shingle-able docs (expected 8 bands). Rebuild with "
            f"build_lsh_index after every extension, or pass "
            f"index=None"
        )
    # rebuild BOTH canaries' band rows in one universe point lookup
    # (per-doc MinHash is corpus-independent), then a two-way set
    # compare per canary against the rows the index agg above already
    # captured. The rebuilt side is collected, so an EMPTY rebuilt
    # set cannot vacuously pass — a foreign index whose ids are
    # absent from this universe is refused, not waved through.
    want: dict = {}
    for r in (
        build_lsh_index(
            universe.where(F.col(id_col).isin(canaries)),
            col=col, id_col=id_col,
        )
        .select("id", "band", "bucket")
        .collect()
    ):
        k = bytes(r["id"]) if isinstance(r["id"], bytearray) else r["id"]
        want.setdefault(k, set()).add((r["band"], r["bucket"]))
    for i, c in enumerate(canaries):
        have = {(r["band"], r["bucket"]) for r in stats[f"__c{i}"]}
        if want.get(c) and want.get(c) == have:
            continue
        if not want.get(c):
            why = (
                "rebuilt band rows are empty (not a "
                "shingle-able doc of this training set)"
            )
        elif not have:
            why = (
                "band rows are missing from the index even "
                "though its coverage count matches — it was "
                "built over a DIFFERENT id set (wrong corpus "
                "or wrong batch)"
            )
        else:
            why = (
                "rebuilt band rows differ from the indexed "
                "ones (different num_hashes / shingle n)"
            )
        raise ValueError(
            "prebuilt index does not match this corpus "
            "under default MinHash parameters: canary doc "
            f"{c!r}'s {why} — the probe would silently find "
            "no candidates. Rebuild with build_lsh_index "
            "defaults, or pass index=None"
        )


def _batch_recipe(
    new_docs: DataFrame,
    universe: DataFrame,
    cfg: dict,
    benchmark: DataFrame | None,
    col: str,
    id_col: str,
    index: DataFrame | None,
    _audit,
    allow_interleaved_ids: bool = False,
    cleanup: list | None = None,
    lm_frames=None,
    image_store_path: str | None = None,
    video_store_path: str | None = None,
    audio_store_path: str | None = None,
    image_batch_id: int = 1,
) -> DataFrame:
    """The recorded recipe over a NEW batch, shared by both extension
    paths so the two cannot drift: insert-if-absent by id (narrow
    id-only scan of the universe), quality, decontamination, dedup
    within the batch, then the cross tiers — the UNIVERSE member
    always wins (keep-first across epochs). Cross tiers run at
    exact-tier KEEPER level (one narrow universe hash scan
    semi-joined; the banded index probed with the tiny batch's
    keepers) and each contact spreads through its within-batch
    near-dup component, so a batch doc that only chains to the
    corpus THROUGH a within-batch loser still drops — the resolution
    a fresh union build computes. NULL-text rows pass every lexical
    tier (NULL hash never equi-matches, matching dedup_corpus's
    null-preservation contract).

    The post-within-batch frame is persisted (appended to ``cleanup``
    for the caller to unpersist after its write action): the
    interleave guard's min(), the audit counts, and the cross tiers
    each reference it, and without a cache every reference re-runs
    quality/decontamination/within-batch dedup over the batch."""
    from .dedup import _dedup_corpus_parts, minhash_lsh_probe, normalize_text

    cur = new_docs
    _audit("input", cur)
    cur = cur.join(universe.select(id_col), id_col, "left_anti")
    _audit("new_ids", cur)
    if cfg.get("quality_filter", True):
        cur = cur.where(_passes_quality(col))
        _audit("quality", cur)
    if cfg.get("qcls") is not None:
        # learned gate under the RECORDED model — row-local, so the
        # batch verdict is identical to a fresh rebuild's by
        # construction (same text, same model, same threshold)
        from .text import _qcls_prob_udf

        q = cfg["qcls"]
        cur = cur.where(
            _qcls_prob_udf(q["model"])(F.col(col))
            >= F.lit(float(q["min_prob"]))
        )
        _audit("qcls", cur)
    if cfg.get("page_filters"):
        # published page filters under the RECORDED thresholds and the
        # frozen lm snapshot — the identical stage function the build
        # ran, so the batch verdict equals a fresh rebuild's
        cur = _apply_page_filters(
            cur, cfg["page_filters"], col, id_col, lm_frames, _audit
        )
    if benchmark is not None:
        cur = decontaminate(
            cur, benchmark, n=cfg["contamination_ngram"],
            col=col, id_col=id_col,
        )
        _audit("decontaminated", cur)
    stage1 = clusters = None
    if cfg.get("dedup", True):
        # pre-dedup persist: the keeper frame, the pair clustering,
        # the survivor anti-joins, and the cross-tier probes below
        # all re-read this point — batch-sized, caller-released
        if cleanup is not None:
            from pyspark import StorageLevel

            cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
            cleanup.append(cur)
        cur, stage1, clusters = _dedup_corpus_parts(
            cur,
            threshold=cfg["dedup_threshold"],
            quality_col=cfg.get("keep_quality_col"),
            col=col,
            id_col=id_col,
        )
    # cache the surviving batch BEFORE anything acts on it: the guard's
    # min() below, the audit counts, and each cross tier's multiple
    # references would otherwise re-run the within-batch resolution
    # per reference — batch-sized, never corpus-sized, and released by
    # the caller. Only when the caller provides the cleanup list: a
    # persist with no owner to unpersist it would pin storage
    if cleanup is not None:
        from pyspark import StorageLevel

        cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
        cleanup.append(cur)
    if cfg.get("dedup", True):
        _audit("deduped_within_batch", cur)
    min_id_lexical = (
        cfg.get("dedup", True) and cfg.get("keep_quality_col") is None
    )
    sem_cfg = cfg.get("semantic_dedup")
    min_id_semantic = (
        bool(sem_cfg) and sem_cfg.get("keep", "min_id") == "min_id"
    )
    img_cfg = cfg.get("image_dedup")
    min_id_image = bool(img_cfg) and img_cfg.get("quality_col") is None
    vid_cfg = cfg.get("video_dedup")
    min_id_video = bool(vid_cfg) and vid_cfg.get("quality_col") is None
    aud_cfg = cfg.get("audio_dedup")
    min_id_audio = bool(aud_cfg) and aud_cfg.get("quality_col") is None
    if (
        min_id_lexical or min_id_semantic or min_id_image
        or min_id_video or min_id_audio
    ) and not allow_interleaved_ids:
        # equality precondition made LOUD (r9 verdict): under a min-id
        # keep policy the cross tiers below keep-first across epochs
        # (the universe member always wins), while a fresh union build
        # keeps the group-wide MIN id — for any duplicate group whose
        # members are all UNIVERSE-VISIBLE the two agree exactly when
        # the rows reaching the cross tiers order AFTER every existing
        # id (the monotone-id ingest shape); an interleaved batch
        # could silently keep a different group representative, so it
        # is refused. The check runs AFTER the within-batch stages so
        # low ids that quality/decontamination/within-batch dedup
        # would drop anyway cannot trigger a false refusal; replayed
        # ids were dropped by the insert-if-absent anti-join.
        # Same-batch chains are CLOSED for the lexical AND semantic
        # tiers (r11): each cross tier probes every within-batch
        # member (exact-tier keepers lexically; all non-null
        # embeddings semantically) and spreads contacts through the
        # within-batch components, so a batch loser bridging a
        # survivor into an existing group drags the survivor down
        # exactly as a fresh union build would. The remaining
        # residual (documented, not detectable from the survivor-
        # only universe): chains THROUGH docs a PREVIOUS epoch
        # dropped. Quality-policy sets skip (ranking is
        # id-order-independent). Cost: one narrow min() over the
        # (cached) surviving batch + one max() over the universe ids.
        lo = cur.agg(F.min(id_col).alias("m")).collect()[0]["m"]
        if lo is not None:
            hi = universe.agg(F.max(id_col).alias("m")).collect()[0]["m"]
            if hi is not None and lo <= hi:
                raise ValueError(
                    f"extension batch ids interleave existing ids "
                    f"(min surviving new {lo!r} <= max existing {hi!r}) "
                    "under the min-id dedup keep policy: extension "
                    "keeps the existing copy of every cross-epoch "
                    "duplicate group, but a fresh union build would "
                    "keep the group's minimum id — the results could "
                    "silently diverge. (Residual even with monotone "
                    "ids: a fresh build can link groups through docs "
                    "a PREVIOUS epoch dropped.) Use monotone ids, a "
                    "quality keep policy, or "
                    "allow_interleaved_ids=True if the batch shares "
                    "no duplicate groups with the corpus"
                )
    if cfg.get("dedup", True):
        # cross tiers run at KEEPER level over ALL exact-tier keepers
        # (stage1), not just the within-batch winners: an exact loser
        # shares its keeper's hash and shingle set, so keeper contact
        # is complete — and probing every keeper lets a within-batch
        # near-dup LOSER's universe contact spread through its
        # component (below), exactly as a fresh union build would
        # fold the whole component into the universe's group (r11,
        # closing the lexical same-batch chain residual)
        ex_hash = universe.where(F.col(col).isNotNull()).select(
            F.sha2(normalize_text(col), 256).alias("__h")
        )
        contacted_exact = (
            stage1.withColumn("__h", F.sha2(normalize_text(col), 256))
            .join(ex_hash, "__h", "left_semi")
            .select(id_col)
        )
        cur = cur.join(contacted_exact, id_col, "left_anti")
        _audit("cross_exact", cur)
        cross = minhash_lsh_probe(
            stage1,
            universe,
            index=index,
            threshold=cfg["dedup_threshold"],
            col=col,
            id_col=id_col,
        )
        ex_ids = universe.select(F.col(id_col).alias("__ex"))
        contacted = (
            cross.join(ex_ids, cross["doc_b"] == F.col("__ex"), "left_semi")
            .select(F.col("doc_a").alias(id_col))
            .unionByName(contacted_exact)
            .distinct()
        )
        # spread each contact through its within-batch near-dup
        # component: every cluster-mate of a contacted keeper loses
        # too (the universe member wins the merged group). Pair-space
        # frames only — no corpus re-scan
        cl = clusters.select(id_col, "cluster_id")
        bad_clusters = (
            cl.join(contacted, id_col, "left_semi")
            .select("cluster_id")
            .distinct()
        )
        spread = cl.join(bad_clusters, "cluster_id", "left_semi").select(
            id_col
        )
        losers = contacted.unionByName(spread).distinct()
        cur = cur.join(losers, id_col, "left_anti")
        _audit("cross_neardup", cur)
    sem = cfg.get("semantic_dedup")
    if sem:
        from .similarity import semdedup_probe

        v = sem["vec_col"]
        # ALL non-null batch members surviving the earlier stages —
        # the probe set for the cross tier below: a within-batch
        # LOSER's corpus contact must still drag its component down
        # (r11, closing the same-batch semantic chain residual)
        pre_nn = cur.where(F.col(v).isNotNull())
        # within-batch semantic dedup under the RECORDED clustering,
        # DECOMPOSED so the cross tier can reuse its components
        cur, batch_comps = _semantic_stage_parts(cur, sem, id_col)
        _audit("semantic_within_batch", cur)
        if sem.get("centroids"):
            if "__semcell" in universe.columns:
                # mixture path: the pool stored its cell assignments
                corpus_cells = universe.where(F.col(v).isNotNull())
            else:
                # plain path: the kept set stores no cells — assign
                # from the recorded centroids (one Arrow pass over the
                # corpus per extension; the premix-pool path avoids
                # this, which is the shape to prefer at scale)
                corpus_cells = _with_semcell(
                    universe, sem, id_col
                ).where(F.col(v).isNotNull())
            pairs = semdedup_probe(
                pre_nn, corpus_cells, sem["centroids"],
                threshold=float(sem["threshold"]),
                id_col=id_col, vec_col=v, cluster_col="__semcell",
            )
            # probe cross pairs are (vec_a=universe, vec_b=batch); the
            # universe member always wins (keep-first across epochs,
            # same contract as the lexical cross tiers); batch×batch
            # pairs fail the semi-join and were already resolved by
            # the within-batch stage
            ex_ids = universe.select(F.col(id_col).alias("__ex"))
            contacted = (
                pairs.join(
                    ex_ids, pairs["vec_a"] == F.col("__ex"), "left_semi"
                )
                .select(F.col("vec_b").alias(id_col))
                .distinct()
            )
            # spread each contact through its within-batch semantic
            # component: a fresh union build merges the whole
            # component into the universe member's group, and the
            # universe wins — so every cluster-mate of a contacted
            # member (including the within-batch KEEPER whose only
            # corpus link ran through a dropped loser) loses too.
            # Pair-space frames only — no corpus re-scan
            cl = batch_comps.select(id_col, "cluster_id")
            bad_clusters = (
                cl.join(contacted, id_col, "left_semi")
                .select("cluster_id")
                .distinct()
            )
            spread = cl.join(
                bad_clusters, "cluster_id", "left_semi"
            ).select(id_col)
            losers = contacted.unionByName(spread).distinct()
            cur = cur.join(losers, id_col, "left_anti")
        _audit("cross_semantic", cur)
    if img_cfg or vid_cfg or aud_cfg:
        # media perceptual tiers under the RECORDED configs: hash the
        # batch ONCE into each store's next fragment, within-batch
        # pairing + keep policy, then the cross probe against the
        # store's prior fragments with contacts restricted to universe
        # members and spread through the within-batch components —
        # the shared stage functions, so build and extension cannot
        # drift (see _image_dedup_stage / _video_dedup_stage). Persist
        # first: each stage's fragment write is an action, and without
        # a cache here it and the caller's final write would EACH
        # evaluate the lexical/semantic cross-tier plan above (a
        # universe probe per evaluation) — batch-sized, caller-released
        if cleanup is not None:
            from pyspark import StorageLevel

            cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
            cleanup.append(cur)
    if img_cfg:
        cur = _image_dedup_stage(
            cur, img_cfg, image_store_path, id_col, _audit,
            batch_id=int(image_batch_id), universe=universe,
        )
    if vid_cfg:
        cur = _video_dedup_stage(
            cur, vid_cfg, video_store_path, id_col, _audit,
            batch_id=int(image_batch_id), universe=universe,
        )
    if aud_cfg:
        cur = _audio_dedup_stage(
            cur, aud_cfg, audio_store_path, id_col, _audit,
            batch_id=int(image_batch_id), universe=universe,
        )
    return cur


def _refresh_manifest_stats(
    spark: SparkSession,
    manifest: dict,
    base: str,
    schema,
    col: str,
    id_col: str,
    audit: bool,
    stages: list,
) -> dict:
    """Post-write manifest refresh shared by both extension paths:
    every statistic from ONE scan of the written files (at the
    manifest's CURRENT ``data_dir`` — the mixture path points it at
    the freshly-written version before calling), epochs incremented, a
    prior audited epoch's curve never masquerading as this one's, and
    the atomic manifest replacement that publishes the pointer."""
    prev_rows = manifest["rows"]
    data_rel = manifest.get("data_dir", "data")
    per_shard, shingleable, canaries = _written_shard_stats(
        spark, f"{base}/{data_rel}", schema, _n_tokens(col).cast("long"),
        shingle_col=col, id_col=id_col,
    )
    manifest["shingleable"] = shingleable
    manifest.pop("canary_ids", None)
    if canaries is not None and _json_safe_ids(canaries):
        manifest["canary_ids"] = canaries
    manifest["shards"] = per_shard
    manifest["rows"] = sum(s["rows"] for s in per_shard.values())
    manifest["tokens"] = sum(s["tokens"] for s in per_shard.values())
    manifest["epochs"] = int(manifest.get("epochs", 1)) + 1
    manifest["appended_rows"] = manifest["rows"] - prev_rows
    manifest.pop("stage_rows", None)
    if audit:
        manifest["stage_rows"] = dict(stages)
    _replace_manifest(spark, f"{base}/manifest.json", manifest)
    return manifest


def _extend_locked(
    spark: SparkSession,
    new_docs: DataFrame,
    base: str,
    benchmark: DataFrame | None,
    index: DataFrame | None,
    audit: bool,
    allow_interleaved_ids: bool = False,
) -> dict:
    existing, manifest = read_training_set(spark, base)
    cfg = manifest["config"]
    if cfg.get("chunk_tokens") is not None:
        raise ValueError(
            "chunked/packed training sets do not extend incrementally; "
            "re-materialize (stored unit is a derived chunk row)"
        )
    if cfg.get("decontaminated") and benchmark is None:
        raise ValueError(
            "this set was built with benchmark decontamination; "
            "pass the benchmark frame (silent skip would contaminate)"
        )
    if not cfg.get("decontaminated") and benchmark is not None:
        raise ValueError(
            "this set was built WITHOUT decontamination; extending "
            "with a benchmark would leave it half-decontaminated"
        )
    if (
        cfg.get("mixture") is not None
        or cfg.get("temperature") is not None
        or cfg.get("dsir") is not None
    ):
        # globally-selected sets (mixture/temperature rates and/or
        # DSIR top-n): a new batch can change which OLD rows are kept,
        # so the kept set re-derives from the premix pool instead of
        # appending
        return _extend_pooled(
            spark, new_docs, base, benchmark, index, audit, manifest,
            allow_interleaved_ids,
        )
    col = cfg.get("col", "text")
    id_col = cfg.get("id_col", "doc_id")
    _validate_batch(new_docs, existing, id_col, "schema")

    if index is not None:
        # staleness guard (shared): manifest stats are the fast path,
        # trusted only while the cheap footer row count matches
        _check_prebuilt_index(
            spark, existing, index, col, id_col,
            shingleable=manifest.get("shingleable"),
            canaries=manifest.get("canary_ids"),
            expect_rows=manifest["rows"],
        )

    stages: list[tuple[str, int]] = []

    def _audit(name: str, frame: DataFrame) -> None:
        if audit:
            stages.append((name, frame.count()))

    cleanup: list[DataFrame] = []
    try:
        cur = _batch_recipe(
            new_docs, existing, cfg, benchmark, col, id_col, index, _audit,
            allow_interleaved_ids=allow_interleaved_ids, cleanup=cleanup,
            lm_frames=_page_filter_ext_inputs(spark, base, cfg),
            image_store_path=_image_ext_inputs(spark, base, cfg),
            video_store_path=_video_ext_inputs(spark, base, cfg),
            audio_store_path=_audio_ext_inputs(spark, base, cfg),
            image_batch_id=int(manifest.get("epochs", 1)),
        )
        out = deterministic_shuffle(
            cur,
            key=id_col,
            salt=f"{manifest['salt']}:shuffle",
            num_shards=manifest["num_shards"],
            shard_col="shard",
        )
        out.write.mode("append").partitionBy("shard").parquet(
            f"{base}/{manifest.get('data_dir', 'data')}"
        )
    finally:
        for frame in cleanup:
            frame.unpersist()
    return _refresh_manifest_stats(
        spark, manifest, base, existing.schema, col, id_col, audit, stages
    )


def _extend_pooled(
    spark: SparkSession,
    new_docs: DataFrame,
    base: str,
    benchmark: DataFrame | None,
    index: DataFrame | None,
    audit: bool,
    manifest: dict,
    allow_interleaved_ids: bool = False,
) -> dict:
    """Incremental extension for GLOBALLY-SELECTED sets — mixture
    rates (r9, lifting the r8 refusal) and/or DSIR selection (r11):
    the recorded recipe runs over the NEW batch only
    (:func:`_batch_recipe` — shared verbatim with the plain path, so
    the two cannot drift), survivors append to the persisted
    pre-selection pool (``base/premix``) carrying their DSIR weight
    scored under the RECORDED model, the global stages re-derive over
    the grown pool with the original salts (DSIR Gumbel-top-n, then
    per-stratum mixture rates), and the kept shards are re-derived
    from the pool — the set a fresh build over the union corpus
    (under the recorded model/clustering) produces (pytest:
    file-order equality under ``ordered=True``). A prebuilt
    ``index`` is accepted and guarded
    against the POOL (the dedup universe here), paying one narrow pool
    text scan for the staleness stats — build it with
    ``build_lsh_index`` over ``base/premix`` after each extension to
    skip the per-call pool re-shingling.

    Equality precondition (same as the plain extension path, where
    the cross tiers also keep-first across epochs): a fresh union
    build resolves cross-epoch duplicate groups by the DEDUP keep
    policy (min-id, or best-quality), while extension always keeps
    the pool member. The two agree exactly when batch ids order after
    existing ids (the monotone-id ingest shape) — or when the quality
    policy ranks the existing copy first; batches with
    arbitrarily-interleaved ids can pick a different group
    representative than the fresh build would. Residual even with
    monotone ids: a fresh union build can link duplicate groups
    through docs a PREVIOUS epoch dropped (undetectable from
    survivors alone) — same-batch chains are closed for BOTH the
    lexical and semantic tiers (r11): cross contacts spread through
    the within-batch components in :func:`_batch_recipe`.

    Why a pool instead of an append-only delta: re-solved rates can
    RISE (the batch feeds the binding stratum), re-admitting rows the
    original mixture dropped — rows no longer present in the kept
    shards. The pool keeps the re-solve universe; the corpus-sized
    stages (quality/decontamination/pairing dedup) still never re-run
    over old data — only the batch is processed, and the kept rewrite
    is a pure hash-filter + shuffle of the pool (O(pool), no pairing,
    no re-scan of the raw corpus).

    Concurrency — snapshot isolation (r10, closing the r9 reader-
    exclusion caveat): the kept rewrite lands in a FRESH versioned
    directory (``base/data_v<epoch>_<nonce>``) and becomes visible
    only through the manifest's ``data_dir`` pointer, flipped by the
    atomic manifest replacement (which routes renames through the
    deployment's ``AtomicPublish`` hook). A reader that loaded the
    manifest before the flip keeps streaming the OLD directory —
    untouched — and one loading after sees the complete new version;
    no reader can observe a mix or a mid-rename crash. Old versions
    accrete until :func:`vacuum_training_set` (run it only when no
    reader still holds a pre-flip manifest). Crash safety under the
    extend lock: the pool append lands before the kept write, so a
    crash between them leaves a consistent old set (plus at most an
    orphaned, unreferenced version dir — vacuumable); ANY later
    extension (even an empty batch) re-derives kept from the pool and
    self-heals.
    """
    import uuid

    from ..sources.txn import _fs, _hpath

    cfg = manifest["config"]
    col = cfg.get("col", "text")
    id_col = cfg.get("id_col", "doc_id")
    premix_schema = cfg.get("premix_schema")
    jvm, fs = _fs(spark, base)
    if premix_schema is None or not fs.exists(_hpath(jvm, base, "premix")):
        raise ValueError(
            "this globally-selected (mixture/dsir) set was "
            "materialized before premix pools: re-materialize once "
            "(the build now writes base/premix), after which "
            "extensions re-derive the kept set incrementally"
        )
    premix_path = f"{base}/premix"
    pool = spark.read.schema(premix_schema).parquet(premix_path)
    _validate_batch(new_docs, pool, id_col, "premix schema")
    if index is not None:
        # the dedup universe is the POOL, so the guard scans it for
        # fresh stats (no recorded pool metadata — the manifest's
        # shingleable/canaries describe the kept shards)
        _check_prebuilt_index(spark, pool, index, col, id_col)

    stages: list[tuple[str, int]] = []

    def _audit(name: str, frame: DataFrame) -> None:
        if audit:
            stages.append((name, frame.count()))

    cleanup: list[DataFrame] = []
    try:
        cur = _batch_recipe(
            new_docs, pool, cfg, benchmark, col, id_col, index, _audit,
            allow_interleaved_ids=allow_interleaved_ids, cleanup=cleanup,
            lm_frames=_page_filter_ext_inputs(spark, base, cfg),
            image_store_path=_image_ext_inputs(spark, base, cfg),
            video_store_path=_video_ext_inputs(spark, base, cfg),
            audio_store_path=_audio_ext_inputs(spark, base, cfg),
            image_batch_id=int(manifest.get("epochs", 1)),
        )

        # pool append FIRST (see crash-safety note above), then
        # re-derive the kept set from the re-read pool files
        if cfg.get("dsir") is not None:
            # batch survivors enter the pool WITH their importance
            # weight scored under the RECORDED model (the build-time
            # column order: logw, then semcell) — the pool is only
            # ever scored one batch at a time
            from .text import _dsir_logw_udf

            cur = cur.withColumn(
                "__dsir_logw_e6",
                _dsir_logw_udf(cfg["dsir"]["model"])(F.col(col)),
            )
        if cfg.get("semantic_dedup"):
            # batch survivors enter the pool WITH their
            # recipe-clustering cell, keeping the stored assignments
            # complete for the next extension's probe
            cur = _with_semcell(cur, cfg["semantic_dedup"], id_col)
        cur.write.mode("append").parquet(premix_path)
    finally:
        for frame in cleanup:
            frame.unpersist()
    pool = spark.read.schema(premix_schema).parquet(premix_path)
    kept_src = pool
    if cfg.get("dsir") is not None:
        kept_src = _dsir_select_stage(kept_src, cfg["dsir"], id_col)
        _audit("dsir", kept_src)
    kept_src = kept_src.drop("__semcell", "__dsir_logw_e6")
    rates: dict[str, float] = {}
    if cfg.get("mixture") is not None:
        kept, rates = target_mixture(
            kept_src, cfg["mixture"], cfg["strata_col"], key=id_col,
            salt=f"{manifest['salt']}:mix",
        )
        _audit("mixture", kept)
    elif cfg.get("temperature") is not None:
        # re-solve the tempered shares from the GROWN pool under the
        # recorded alpha + original salt — the same pure-function-of-
        # pool shape as the target-mixture re-solve
        kept, rates = temperature_mixture(
            kept_src, cfg["strata_col"], alpha=float(cfg["temperature"]),
            key=id_col, salt=f"{manifest['salt']}:mix",
        )
        _audit("mixture", kept)
    else:
        kept = kept_src
    out = deterministic_shuffle(
        kept,
        key=id_col,
        salt=f"{manifest['salt']}:shuffle",
        num_shards=manifest["num_shards"],
        shard_col="shard",
    )
    # versioned publish: write the new kept set to a fresh directory
    # (nonce-suffixed so a crashed prior attempt can never collide),
    # then flip the manifest's data_dir pointer atomically — the old
    # version stays on disk untouched for in-flight readers
    new_rel = (
        f"data_v{int(manifest.get('epochs', 1)) + 1}_{uuid.uuid4().hex[:8]}"
    )
    out.write.mode("errorifexists").partitionBy("shard").parquet(
        f"{base}/{new_rel}"
    )
    manifest["data_dir"] = new_rel
    if (
        cfg.get("mixture") is not None
        or cfg.get("temperature") is not None
    ):
        cfg["solved_mixture_rates"] = rates or None
    return _refresh_manifest_stats(
        spark, manifest, base, out.schema, col, id_col, audit, stages
    )


def read_training_set(
    spark: SparkSession, out_path: str, ordered: bool = False
) -> tuple[DataFrame, dict]:
    """Load a materialized training set: ``(data, manifest)``.

    A single-shot build writes exactly ONE part file per shard (the
    shuffle's range exchange puts each shard in one task), so the
    default read already yields (shard, global shuffle position)
    order and a loader striding shards gets disjoint, jointly
    exhaustive slices of the global permutation. After
    :func:`extend_training_set` a shard holds part files from several
    write jobs and parquet guarantees NO cross-file order — pass
    ``ordered=True`` to re-derive the shuffle hash (a pure function of
    the recorded salt and each row's key) and sort each shard back
    into the exact permutation a single-shot build of the same rows
    would produce (one in-shard sort, no global exchange beyond the
    shard repartition)."""
    base = out_path.rstrip("/")
    manifest = json.loads(
        _read_manifest_text(spark, f"{base}/manifest.json")
    )
    # data_dir pointer: mixture extensions publish each re-derived
    # kept set as a fresh versioned directory and flip this field —
    # the read pins the version its manifest snapshot names, so a
    # concurrent extension can never mutate files under this frame
    data_rel = manifest.get("data_dir", "data")
    data = (
        spark.read.schema(manifest["schema"])
        .option("basePath", f"{base}/{data_rel}")
        .parquet(f"{base}/{data_rel}")
    )
    if ordered:
        cfg = manifest.get("config", {})
        id_col = cfg.get("id_col", "doc_id")
        # the same shuffle key construction as materialize: documents
        # key on id, chunks on id#chunk_idx, packs on the pack id with
        # the (doc, chunk) tiebreak
        # tiebreak below the hash on the RAW key column, exactly as
        # deterministic_shuffle sorted at build time (hash input is
        # the string cast, the tiebreak is not — a string tiebreak
        # would order hash-colliding numeric ids differently)
        if manifest["unit"] == "packed_chunks":
            key = F.col("pack_id").cast("string")
            tiebreak = [key, F.col(id_col), F.col("chunk_idx")]
        elif manifest["unit"] == "chunks":
            key = F.concat_ws(
                "#", F.col(id_col).cast("string"), F.col("chunk_idx")
            )
            tiebreak = [key]
        else:
            key = F.col(id_col).cast("string")
            tiebreak = [F.col(id_col)]
        h = F.xxhash64(F.lit(f"{manifest['salt']}:shuffle"), key)
        data = data.repartitionByRange(
            int(manifest["num_shards"]), F.col("shard")
        ).sortWithinPartitions(F.col("shard"), h, *tiebreak)
    return data, manifest


def vacuum_training_set(spark: SparkSession, out_path: str) -> list[str]:
    """Delete superseded data versions of a training set: every
    ``data``/``data_v*`` directory under the set EXCEPT the one the
    live manifest's ``data_dir`` points at. Mixture extensions publish
    each re-derived kept set as a fresh versioned directory (snapshot
    isolation — in-flight readers keep their version), so old versions
    accrete until this explicit call — the Delta-VACUUM shape: run it
    only when no reader still holds a pre-flip manifest, since their
    files are removed irrecoverably. Also removes orphaned version
    dirs left by a crash between the kept write and the pointer flip.
    Takes the ``_extend.lock`` for its duration: without it a vacuum
    racing an in-flight extension would see the extension's
    not-yet-published version dir as an orphan and delete it out from
    under the imminent pointer flip. Consequence for crash cleanup: a
    crashed extension leaves BOTH an orphan dir and the stale lock, so
    this call then refuses with the lock-held error — confirm no
    extension is running, delete ``_extend.lock`` (as that error says),
    and re-run the vacuum. Returns the relative names removed."""
    base = out_path.rstrip("/")
    from ..sources.txn import _fs, _hpath

    _acquire_extend_lock(spark, base)
    try:
        manifest = json.loads(
            _read_manifest_text(spark, f"{base}/manifest.json")
        )
        live = manifest.get("data_dir", "data")
        jvm, fs = _fs(spark, base)
        removed: list[str] = []
        for st in fs.listStatus(_hpath(jvm, base)):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name != live and (
                name == "data" or name.startswith("data_v")
            ):
                fs.delete(st.getPath(), True)
                removed.append(name)
        return sorted(removed)
    finally:
        _release_extend_lock(spark, base)


def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    # The txn module's Hadoop-FS plumbing (one copy in the codebase)
    # and its commit discipline: stage to a temp name, publish with a
    # no-overwrite rename — a reader can never observe a truncated
    # manifest, and a racing second materialize fails loudly instead
    # of clobbering (its data write already failed on errorifexists).
    import uuid

    from ..sources.txn import _fs, _hpath, _rename_no_overwrite, _write_file

    jvm, fs = _fs(spark, path)
    parent, name = path.rsplit("/", 1)
    tmp = _hpath(jvm, parent, f".tmp-{name}-{uuid.uuid4().hex}")
    _write_file(fs, tmp, json.dumps(manifest, sort_keys=True))
    try:
        _rename_no_overwrite(spark, jvm, tmp, _hpath(jvm, path))
    except Exception:
        fs.delete(tmp, False)
        raise


def _acquire_extend_lock(spark: SparkSession, base: str) -> None:
    """Single-writer guard: atomically create ``_extend.lock``. Two
    racing extensions would both read the pre-append snapshot and
    double-append; the loser here fails BEFORE any data lands.

    Scope of the guarantee: ``FileSystem.createNewFile`` is exclusive
    on HDFS and local filesystems. On object stores without atomic
    create-if-absent (plain S3A) it degrades to check-then-put —
    deployments there install a conditional-put
    :class:`~etl_workflow_spark.sources.txn.AtomicPublish` hook
    (``set_publish_hook``), which this guard routes through — the
    SAME hook that makes the txn log's commit rename honest."""
    from ..sources.txn import _fs, _hpath, _publisher

    jvm, fs = _fs(spark, base)
    lock = _hpath(jvm, base, "_extend.lock")
    if not _publisher().create_exclusive(spark, fs, lock):
        raise RuntimeError(
            f"another extend_training_set holds {base}/_extend.lock; "
            "if no extension is actually running (a crashed one leaves "
            "the marker behind), delete the lock file and retry"
        )


def _release_extend_lock(spark: SparkSession, base: str) -> None:
    from ..sources.txn import _fs, _hpath

    jvm, fs = _fs(spark, base)
    fs.delete(_hpath(jvm, base, "_extend.lock"), False)


def _replace_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    """Atomic-as-available manifest replacement: stage the new JSON to
    a tmp name, demote the live manifest to ``.bak`` (previous ``.bak``
    deleted), publish with a no-overwrite rename. Readers never see a
    truncated file. If the publish fails after the demote, the live
    manifest is restored from ``.bak``; only if that restore ALSO
    fails are ``.bak`` + the staged tmp left behind (rename either
    back to recover — and the raised error still points here)."""
    import uuid

    from ..sources.txn import _fs, _hpath, _rename_no_overwrite, _write_file

    jvm, fs = _fs(spark, path)
    parent, name = path.rsplit("/", 1)
    tmp = _hpath(jvm, parent, f".tmp-{name}-{uuid.uuid4().hex}")
    _write_file(fs, tmp, json.dumps(manifest, sort_keys=True))
    bak = _hpath(jvm, parent, f"{name}.bak")
    live = _hpath(jvm, path)
    fs.delete(bak, False)
    if not fs.rename(live, bak):
        fs.delete(tmp, False)
        raise IOError(f"could not demote {path} to .bak")
    try:
        _rename_no_overwrite(spark, jvm, tmp, live)
    except Exception:
        # the live slot is empty (we just demoted it) — put the old
        # manifest back so readers keep working; keep the tmp only
        # when even the restore fails
        if fs.rename(bak, live):
            fs.delete(tmp, False)
        raise


def _read_manifest_text(spark: SparkSession, path: str) -> str:
    from ..sources.txn import _fs, _hpath, _read_file

    jvm, fs = _fs(spark, path)
    return _read_file(jvm, fs, _hpath(jvm, path))


def training_set_report(
    spark: SparkSession, out_path: str, markdown: bool = False
):
    """Data card for a materialized training set — the one-call audit
    summary a dataset release ships (the "datasheet" practice; Gebru
    et al. 2021): identity, size and shard balance, the FULL recipe as
    recorded in the manifest (quality gate, classifier, benchmark
    decontamination, lexical/semantic dedup, DSIR selection, mixture
    rates, chunk/pack), and — when the set was built with
    ``audit=True`` — the stage-by-stage drop accounting with per-stage
    deltas. Everything comes from the manifest: NO data scan, so the
    report is instant at any corpus size and reflects exactly the
    recorded lineage (the same snapshot a concurrent reader pins).

    Returns a small DataFrame ``(section, key, value string)`` for
    programmatic access, or the rendered markdown string with
    ``markdown=True``. Capability analog in the reference: none —
    extension-tier release tooling."""
    base = out_path.rstrip("/")
    manifest = json.loads(
        _read_manifest_text(spark, f"{base}/manifest.json")
    )
    cfg = manifest.get("config", {})
    rows: list[tuple[str, str, str]] = []

    def add(section: str, key: str, value) -> None:
        rows.append((section, key, str(value)))

    add("identity", "format", manifest.get("format"))
    add("identity", "unit", manifest.get("unit"))
    add("identity", "salt", manifest.get("salt"))
    add("identity", "epochs", manifest.get("epochs"))
    add("identity", "data_dir", manifest.get("data_dir", "data"))
    add("size", "rows", manifest.get("rows"))
    add("size", "tokens", manifest.get("tokens"))
    add("size", "num_shards", manifest.get("num_shards"))
    shards = manifest.get("shards") or {}
    if shards:
        per = sorted(int(s["rows"]) for s in shards.values())
        add("size", "shard_rows_min", per[0])
        add("size", "shard_rows_max", per[-1])
        add("size", "shard_rows_median", per[len(per) // 2])
    recipe = [
        ("quality_filter", cfg.get("quality_filter")),
        ("quality_classifier", bool(cfg.get("qcls")) or None),
        ("page_filters", cfg.get("page_filters")),
        ("decontaminated", cfg.get("decontaminated") or None),
        ("contamination_ngram", cfg.get("contamination_ngram")),
        ("lexical_dedup", cfg.get("dedup") or None),
        ("dedup_threshold", cfg.get("dedup_threshold")),
        ("keep_policy", cfg.get("keep_quality_col") and "best-quality"
         or (cfg.get("dedup") and "min-id") or None),
        ("semantic_dedup",
         bool(cfg.get("semantic_dedup")) or None),
        ("image_dedup", cfg.get("image_dedup")),
        ("video_dedup", cfg.get("video_dedup")),
        ("audio_dedup", cfg.get("audio_dedup")),
        ("dsir_selection", bool(cfg.get("dsir")) or None),
        ("mixture", cfg.get("mixture")),
        ("temperature", cfg.get("temperature")),
        ("strata_col", cfg.get("strata_col")),
        ("solved_mixture_rates", cfg.get("solved_mixture_rates")),
        ("chunk_tokens", cfg.get("chunk_tokens")),
        ("pack_budget", cfg.get("pack_budget")),
    ]
    for key, val in recipe:
        if val is not None:
            add("recipe", key, val)
    stage_rows = manifest.get("stage_rows") or {}
    if stage_rows:
        # the manifest serializes sort_keys=True, so pipeline order is
        # re-derived from the canonical audit sequence — the merged
        # order of BOTH writers (materialize_training_set's build
        # audits and extend_training_set's extension audits, which
        # REWRITE stage_rows on audited extensions); per-stage deltas
        # are only meaningful in that order (unknown extra keys append
        # with their raw count, no delta claimed)
        pipeline = [
            "input", "new_ids", "quality", "qcls",
            "c4", "gopher", "compression", "lm_filter",
            "decontaminated",
            "deduped", "deduped_within_batch", "cross_exact",
            "cross_neardup", "semantic_dedup", "semantic_within_batch",
            "cross_semantic", "image_dedup", "image_within_batch",
            "cross_image", "video_dedup", "video_within_batch",
            "cross_video", "audio_dedup", "audio_within_batch",
            "cross_audio", "dsir", "mixture",
        ]
        ordered = [s for s in pipeline if s in stage_rows] + sorted(
            set(stage_rows) - set(pipeline)
        )
        prev = None
        for name in ordered:
            n = stage_rows[name]
            delta = (
                ""
                if prev is None or name not in pipeline
                else f" ({int(n) - prev:+d})"
            )
            add("stages", name, f"{n}{delta}")
            prev = int(n)
    add("integrity", "schema", manifest.get("schema"))
    add("integrity", "shingleable", manifest.get("shingleable"))
    if manifest.get("canary_ids") is not None:
        add("integrity", "canary_ids", manifest["canary_ids"])
    if not markdown:
        return spark.createDataFrame(
            rows, "section string, key string, value string"
        )
    lines = [f"# Training-set data card: {base.rsplit('/', 1)[-1]}", ""]
    section = None
    for sec, key, value in rows:
        if sec != section:
            lines += [f"## {sec}", ""]
            section = sec
        lines.append(f"- **{key}**: {value}")
    return "\n".join(lines) + "\n"


def diff_training_sets(
    spark: SparkSession, path_a: str, path_b: str
) -> DataFrame:
    """Membership diff between two materialized training sets — the
    release-audit companion to :func:`training_set_report`: which unit
    ids entered and which left between snapshot A and snapshot B
    (e.g. yesterday's set vs today's extension, or two recipe
    variants). Two anti-joins on the recorded id column, nothing else
    — no text comparison, no full sort. Refuses sets whose recorded
    UNIT differs (document ids and packed-chunk ids live in different
    id spaces; diffing them would be meaningless). Returns
    ``(id, status)`` with status ``added`` (in B only) or ``removed``
    (in A only); unchanged ids are omitted (the common case is
    almost-everything-unchanged — emitting it would dwarf the
    signal)."""
    data_a, man_a = read_training_set(spark, path_a)
    data_b, man_b = read_training_set(spark, path_b)
    if man_a.get("unit") != man_b.get("unit"):
        raise ValueError(
            f"cannot diff training sets of different units "
            f"({man_a.get('unit')!r} vs {man_b.get('unit')!r})"
        )
    id_col = man_a.get("config", {}).get("id_col", "doc_id")
    a_ids = data_a.select(F.col(id_col).alias("id")).distinct()
    b_ids = data_b.select(F.col(id_col).alias("id")).distinct()
    added = b_ids.join(a_ids, "id", "left_anti").select(
        "id", F.lit("added").alias("status")
    )
    removed = a_ids.join(b_ids, "id", "left_anti").select(
        "id", F.lit("removed").alias("status")
    )
    return added.unionByName(removed)
