package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{Dedup, Joins, Multimodal, Sampling, Similarity, TextAnalysis}

/** Training-data pipeline operators over `documents`/`embeddings`
  * (builder-prompt scope beyond the reference): dedup family, similarity
  * search, text analysis, multimodal plumbing.
  *
  * Every entry has a full DuckDB oracle that RECOMPUTES the operator from
  * the base tables — including the "probabilistic" ones: minhash/simhash
  * signatures and LSH bands are derived from md5 halves
  * ([[graft.functions.PortableHash]] == DuckDB md5_number_lower/upper)
  * and deterministic plane/centroid literals, so banding decisions,
  * candidate sets and ranks are bit-reproducible in plain SQL. Corpora
  * plant near-duplicates (identical twins, +0.05 perturbed embeddings) so
  * no oracle passes vacuously on an empty result.
  */
object ExtensionQueries {

  /** Per-process scratch dir for queries that persist mutable state
    * (streaming replay state, trained index round-trips). Keyed by PID so
    * two harness processes on one checkout (bench and correctness running
    * concurrently) can never race on seed/reset of the same dir.
    *
    * Hygiene: this process's dirs are deleted by a shutdown hook, and
    * the first call also reaps dirs left by DEAD pids (kill -9'd or
    * crashed harnesses can't run their own hooks — without the reap,
    * `target/` accumulates hundreds of orphaned state dirs).
    */
  private val createdScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(); ()
  }

  private lazy val scratchInit: Unit = {
    val pidPat = """.*_pid(\d+)$""".r
    Option(new java.io.File("target").listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        f.getName match {
          case pidPat(p) if f.isDirectory &&
              p.toLong != ProcessHandle.current().pid() && {
                val h = ProcessHandle.of(p.toLong)
                !(h.isPresent && h.get.isAlive)
              } =>
            deleteRec(f)
          case _ => ()
        }
      }
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      createdScratch.forEach(d => deleteRec(new java.io.File(d)))))
  }

  private def scratchDir(kind: String, sfDir: String): String = {
    scratchInit
    val d =
      s"target/${kind}_${new java.io.File(sfDir).getName}_pid${ProcessHandle.current().pid()}"
    createdScratch.add(d)
    d
  }

  /** Opt-in streaming-replay phase decomposition, shared by the replay
    * queries: set `SPARK_GRAFT_REPLAY_TIMING` to anything but ""/"0"
    * (the docs' `=1`) to print per-phase wall — and, when a `stateDir`
    * is passed, the on-disk state size after the phase. Off by default;
    * the driver never sets it.
    */
  private lazy val replayTiming: Boolean =
    sys.env.get("SPARK_GRAFT_REPLAY_TIMING").exists(v => v.nonEmpty && v != "0")

  private def replayPhase[A](tag: String, label: String,
      stateDir: Option[String] = None)(f: => A): A =
    if (!replayTiming) f else {
      val t0 = System.nanoTime()
      val r = f
      val state = stateDir.map { sd =>
        val bytes = try {
          import scala.jdk.CollectionConverters._
          val p = java.nio.file.Paths.get(sd)
          if (!java.nio.file.Files.exists(p)) 0L
          else java.nio.file.Files.walk(p).iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
        } catch { case _: Throwable => -1L }
        s"  state=${bytes / 1024} KiB"
      }.getOrElse("")
      System.err.println(
        f"[$tag] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.1f s$state")
      r
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- exact dedup: fingerprint groups over a corpus with planted dups -
    "dedup_exact" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      // plant exact duplicates: every doc re-appears with a shifted id
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.exactGroups(corpus, col("text"), col("doc_id"))
        .orderBy(col("fp"))
    },

    // --- exact dedup, drop form: keep the min-id row per fingerprint ----
    "dedup_drop_exact" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.dropExact(corpus, col("text"), col("doc_id"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // --- exact n-gram Jaccard near-dup pairs (bounded slice; corpus
    //     plants a 3-word-suffix twin per doc so pairs exist) ------------
    "dedup_ngram_jaccard" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 100)
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" zzdup zzmarker zztoken")).as("text")))
      Dedup.nearDupPairsExact(corpus, "doc_id", "text", n = 3, threshold = 0.05)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    },

    // --- minhash-LSH near-dups (oracle recomputes signatures + banding) --
    "dedup_minhash_lsh" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupPairsMinhash(corpus, "doc_id", "text",
          n = 3, bands = 8, rows = 4, threshold = 0.9)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    },

    // --- incremental dedup: a FRESH batch checked against the existing
    //     REFERENCE corpus only (no ref x ref or new x new re-pairing —
    //     the ingestion-time shape); half the batch is exact twins, half
    //     suffix-perturbed near-twins -----------------------------------
    "dedup_minhash_incr" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val ref = d.select(col("doc_id"), col("text"))
      val fresh = d.select((col("doc_id") + 1000000).as("doc_id"),
        when(col("doc_id") < 250, col("text"))
          .otherwise(concat(col("text"), lit(" zznew zztoken zzmark"))).as("text"))
      Dedup.nearDupsAgainstMinhash(ref, fresh, "doc_id", "text",
          n = 3, bands = 8, rows = 4, threshold = 0.5)
        .select(col("ref_id"), col("new_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("ref_id"), col("new_id"))
    },

    // --- fuzzy decontamination: near-copies of benchmark docs (planted
    //     with an id-salted suffix) flagged by cross-corpus minhash ------
    "text_decontaminate_fuzzy" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 150)
        .withColumn("bid", col("doc_id") % 20)
        .join(bench.select(col("doc_id").as("bid"), col("text").as("btext")),
          "bid")
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("btext"), lit(" zz"),
            col("doc_id").cast("string")).as("text"))
      val corpus = d.filter(col("doc_id") >= 20).union(planted)
      Dedup.nearDupsAgainstMinhash(bench, corpus, "doc_id", "text",
          n = 3, bands = 8, rows = 4, threshold = 0.5)
        .select(col("ref_id"), col("new_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("ref_id"), col("new_id"))
    },

    // --- simhash near-dups (oracle recomputes the 64-bit signatures) -----
    "dedup_simhash" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupPairsSimhash(corpus, "doc_id", "text", maxHamming = 3)
        .orderBy(col("a"), col("b"))
    },

    // --- simhash near-dups at WIDE recall: the same 16-bit bands probed
    //     within a 1-bit flip ball (multi-probe), exact recall to
    //     hamming 6 — the scale path for looser thresholds, where a
    //     single-byte re-band would cost n²/64 candidates ---------------
    "dedup_simhash_wide" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupPairsSimhash(corpus, "doc_id", "text", maxHamming = 6,
          wideRecall = true)
        .orderBy(col("a"), col("b"))
    },

    // --- per-doc character-distribution Shannon entropy (compressibility
    //     proxy: degenerate repetition scores ~0, prose ~4, junk high;
    //     quality pipelines band-filter both tails). One scan-local pass
    //     per doc — no per-character explode/shuffle ------------------
    "text_entropy" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      d.select(col("doc_id"),
          round(graft.functions.CharEntropy.of(col("text")), 6).as("entropy"))
        .orderBy(col("doc_id"))
    },

    // --- edit-distance fuzzy join on short normalized keys (record
    //     linkage): SymSpell deletion-neighborhood banding + threshold
    //     levenshtein verify; planted substitution (m1) and deletion
    //     (m2) mutants of the first 50 keys --------------------------
    "text_fuzzy_join" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 200)
        .select(col("doc_id"), lower(substring(col("text"), 1, 16)).as("k"))
      val m1 = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(substring(col("k"), 1, 3), lit("q"),
            substring(col("k"), 5, 1000)).as("k"))
      val m2 = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(substring(col("k"), 1, 8),
            substring(col("k"), 10, 1000)).as("k"))
      val c = d.union(m1).union(m2)
      Dedup.nearDupPairsEdit(c, "doc_id", "k", maxDist = 2)
        .orderBy(col("a"), col("b"))
    },

    // --- exact-substring dedup: pairs sharing a verbatim 40-char window
    //     (Lee et al.) — planted spans (60 chars of a benchmark doc
    //     appended to 100 shifted docs) plus whatever the corpus shares
    //     naturally; rolling-hash banding + witness verify against the
    //     real text, so the oracle is the TRUE substring join ------------
    "dedup_substring_exact" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val spans = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bid"),
          substring(col("text"), 1, 60).as("span"))
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans, "bid")
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      val corpus = d.union(planted)
      Dedup.substringDupPairs(corpus, "doc_id", "text", k = 40)
        .orderBy(col("a"), col("b"))
    },

    // --- same pairs at WINNOWED gram density (the 100 TB path: ~2/(w+1)
    //     of the grams shuffle; spans >= k+w-1 chars are guaranteed
    //     caught, and the planted spans are 61 >= 49). The winnow
    //     selection is replayed exactly in the DuckDB oracle: the
    //     polynomial rolling hash is deterministic modular arithmetic
    //     (prefix-hash recursive CTE, mod-2^64 in HUGEINT) and the
    //     rightmost-min-per-window champion is a window-min over an
    //     (h1, -pos) composite key --------------------------------------
    "dedup_substring_winnow" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val spans = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("bid"),
          substring(col("text"), 1, 60).as("span"))
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans, "bid")
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      val corpus = d.union(planted)
      Dedup.substringDupPairsWinnowed(corpus, "doc_id", "text",
          k = 40, w = 10)
        .orderBy(col("a"), col("b"))
    },

    // --- embedding cosine near-dups (planted +0.05 twins) ----------------
    "dedup_embedding" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val corpus = e.union(
        e.select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.05)).as("embedding")))
      Similarity.embeddingNearDups(
          corpus, corpus.filter(col("vec_id") < 50), threshold = 0.75)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("a"), col("b"))
    },

    // --- corpus-wide embedding near-dups, the scale path: LSH-banded
    //     candidate pairs + exact cosine verify (no all-pairs product;
    //     oracle recomputes bands from the identical plane literals) ------
    "dedup_embedding_lsh" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val corpus = e.union(
        e.select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.05)).as("embedding")))
      Similarity.nearDupPairsEmbedding(corpus, threshold = 0.75, dims = 64)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("a"), col("b"))
    },

    // --- incremental embedding dedup: fresh vectors banded against the
    //     reference corpus only (cross-corpus candidates, exact cosine
    //     verify) --------------------------------------------------------
    "dedup_embedding_incr" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val fresh = e.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
      Similarity.nearDupsAgainstEmbedding(e, fresh, threshold = 0.75, dims = 64)
        .select(col("ref_id"), col("new_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("ref_id"), col("new_id"))
    },

    // --- standing streaming dedup, replayed under oracle: seed the
    //     persisted minhash state from 1/5 of the corpus, admit K=3
    //     deterministic batches derived from the same base docs (half
    //     exact twins, half suffix-perturbed — every batch pairs with
    //     the seed AND with every earlier batch, so the oracle is green
    //     only if state genuinely ACCUMULATES across admissions), with a
    //     compaction after batch 0 so the fold is exercised under the
    //     oracle too. The oracle recomputes each batch's cross-corpus
    //     pairs against exactly the ids admitted before it -------------
    "stream_dedup_replay" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val base = d.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      def batchDf(k: Int) = base.select(
        (col("doc_id") + lit((k + 1) * 1000000L)).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zzre zzplay zzmark")))
          .as("text"))
      val stateDir =
        scratchDir("stream_replay", dir)
      // opt-in phase decomposition ([[replayPhase]]): the replay's wall
      // at 10x is dominated by SOMETHING — per-phase wall + on-disk
      // state size after each phase names it (admit() is eager via
      // localCheckpoint, so each phase's work lands inside its own
      // window; the final write only unions pinned results)
      def phase[A](label: String)(f: => A): A =
        replayPhase("replay", label, Some(stateDir))(f)
      val sd = new graft.streaming.StreamingDedup(s, stateDir,
        "doc_id", "text", n = 3, bands = 8, rows = 4, threshold = 0.5)
      phase("seed")(sd.seed(base))
      val pairs = (0 until 3).map { k =>
        val p = phase(s"admit$k")(
          sd.admit(batchDf(k), k.toLong)).withColumn("batch", lit(k))
        // fold seed + batch 0 into one snapshot mid-replay: batches 1-2
        // must see identical state through the compaction
        if (k == 0) phase("compact")(sd.compact(upTo = 0L))
        p
      }.reduce(_ unionByName _)
      pairs.select(col("batch"), col("ref_id"), col("new_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("batch"), col("ref_id"), col("new_id"))
    },

    // --- standing paragraph filter, replayed under oracle: seed state
    //     from a 3-paragraph-per-doc corpus; every batch doc repeats the
    //     seed's boilerplate + body (both drop) and carries a versioned
    //     tail — batch 2's odd-doc tails repeat batch 0's, so they drop
    //     ONLY if state accumulated across admissions -------------------
    "stream_paradedup_replay" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val base = d.filter(col("doc_id") % 5 === 0)
      val boiler = lit("shared boilerplate paragraph on every doc")
      val seedCorpus = base.select(col("doc_id"),
        concat_ws("\n", boiler, col("text"),
          concat(lit("seed tail "), col("doc_id"))).as("text"))
      def batchDf(k: Int) = base.select(
        (col("doc_id") + lit((k + 1) * 1000000L)).as("doc_id"),
        concat_ws("\n", boiler, col("text"),
          concat(lit("tail "), col("doc_id"), lit(" v"),
            when(col("doc_id") % 2 === 0, lit(k)).otherwise(lit(k % 2))))
          .as("text"))
      val stateDir =
        scratchDir("stream_parareplay", dir)
      val sd = new graft.streaming.StreamingParagraphDedup(s, stateDir,
        "doc_id", "text")
      sd.seed(seedCorpus)
      val out = (0 until 3).map { k =>
        val p = sd.admit(batchDf(k), k.toLong).withColumn("batch", lit(k))
        if (k == 0) sd.compact(upTo = 0L)
        p
      }.reduce(_ unionByName _)
      out.select(col("batch"), col("id"), col("n_paras_kept"),
          col("text_dedup"))
        .orderBy(col("batch"), col("id"))
    },

    // --- the embedding twin of stream_dedup_replay: same seed/3-batch/
    //     compact-after-0 structure over the RHP-banded vector state;
    //     every batch pairs with the seed and with earlier batches ------
    "stream_embdedup_replay" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val base = e.filter(col("vec_id") % 5 === 0)
      def batchDf(k: Int) = base.select(
        (col("vec_id") + lit((k + 1) * 1000000L)).as("vec_id"),
        when(col("vec_id") % 2 === 0, col("embedding"))
          .otherwise(transform(col("embedding"), x => x + lit(0.05)))
          .as("embedding"))
      val stateDir =
        scratchDir("stream_embreplay", dir)
      val sed = new graft.streaming.StreamingEmbeddingDedup(s, stateDir,
        "vec_id", "embedding", dims = 64, threshold = 0.75)
      sed.seed(base)
      val pairs = (0 until 3).map { k =>
        val p = sed.admit(batchDf(k), k.toLong).withColumn("batch", lit(k))
        if (k == 0) sed.compact(upTo = 0L)
        p
      }.reduce(_ unionByName _)
      pairs.select(col("batch"), col("ref_id"), col("new_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("batch"), col("ref_id"), col("new_id"))
    },

    // --- the semantic (SemDeDup) twin: centroids train on the SEED
    //     corpus only (exactly what StreamingSemanticDedup.seed does),
    //     batches assign cells with the loaded index and pair within
    //     shared cells against everything admitted before -----------------
    "stream_semdedup_replay" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val base = e.filter(col("vec_id") % 5 === 0)
      def batchDf(k: Int) = base.select(
        (col("vec_id") + lit((k + 1) * 1000000L)).as("vec_id"),
        when(col("vec_id") % 2 === 0, col("embedding"))
          .otherwise(transform(col("embedding"), x => x + lit(0.05)))
          .as("embedding"))
      val stateDir =
        scratchDir("stream_semreplay", dir)
      val ssd = new graft.streaming.StreamingSemanticDedup(s, stateDir,
        "vec_id", "embedding", nCells = 16, threshold = 0.75)
      ssd.seed(base)
      val pairs = (0 until 3).map { k =>
        val p = ssd.admit(batchDf(k), k.toLong).withColumn("batch", lit(k))
        if (k == 0) ssd.compact(upTo = 0L)
        p
      }.reduce(_ unionByName _)
      pairs.select(col("batch"), col("ref_id"), col("new_id"), col("cell"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("batch"), col("ref_id"), col("new_id"))
    },

    // --- the multimodal twin of stream_dedup_replay: standing phash
    //     fingerprint state (band-bucketed on BatchedState), three
    //     admitted image batches derived from pixel id (asset_id % 100)
    //     — so each batch carries REAL in-batch cliques of 3 (ids pid,
    //     pid+100, pid+200 share the pixel content) and the SAME
    //     fingerprint recurs across batches (cross-batch version fold);
    //     even pixel ids byte-exact — hamming 0 to the seed and to
    //     every earlier batch; odd ids noisy — a few gradient bits off;
    //     compaction after batch 0. The oracle regenerates every dHash
    //     from the pixel arithmetic, collapses each arm by fingerprint
    //     (rep = min id, clique = count), and replays each batch's
    //     band-probed representative pairs against exactly the versions
    //     admitted before it, folding state versions per fingerprint
    //     (ref_id = all-time min id, clique_ref = summed multiplicity) —
    //     the collapse-first default's representative contract ---------
    "stream_phash_replay" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      val seed = ids.select(col("asset_id"),
        Multimodal.bmpContent(col("asset_id"), 8, lit(false)).as("content"))
      def batchAssets(shift: Long) = ids
        .select(col("asset_id"),
          Multimodal.bmpContent(col("asset_id") % 100, 8,
            col("asset_id") % 2 =!= 0).as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      def decoded(df: org.apache.spark.sql.DataFrame) =
        Multimodal.decodeImages(df).toDF()
          .select(col("asset_id"), col("dhash"))
      val stateDir = scratchDir("stream_phash", dir)
      val spd = new graft.streaming.StreamingPhashDedup(s, stateDir,
        "asset_id", "dhash", maxHamming = 7, wideRecall = true)
      spd.seed(decoded(seed))
      val pairs = (0 until 3).map { k =>
        val p = spd.admit(decoded(batchAssets((k + 1) * 1000000L)), k.toLong)
          .withColumn("batch", lit(k))
        if (k == 0) spd.compact(upTo = 0L)
        p
      }.reduce(_ unionByName _)
      pairs.select(col("batch"), col("ref_id"), col("new_id"),
          col("hamming"), col("clique_ref"), col("clique_new"))
        .orderBy(col("batch"), col("ref_id"), col("new_id"))
    },

    // --- standing streaming decontamination, replayed under oracle: seed
    //     the benchmark 8-gram state from docs < 20; three admitted doc
    //     batches plant benchmark quotes (doc_id%4==1 quotes the SEED
    //     set, %4==3 quotes a SECOND benchmark release folded in at
    //     batch id 1 — flagged from batch id 2 on, proving the state
    //     accumulated), with a compaction right after the addition so
    //     the fold sits under the oracle too ----------------------------
    "stream_decontaminate_replay" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val bench0 = d.filter(col("doc_id") < 20)
      val bench1 = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      def spans(bench: DataFrame) = bench.select(
        (col("doc_id") % 20).as("bid"),
        concat_ws(" ",
          slice(TextAnalysis.canonToks(col("text")), 1, 8)).as("span"))
      val base = d.filter(col("doc_id") % 5 === 0)
      def quoted(bench: DataFrame, m: Int) = base
        .filter(col("doc_id") % 4 === m)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans(bench), "bid")
        .select(col("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      // ids shift AFTER the text is built (lateral-alias hazard)
      def batchDf(k: Int) = base.filter(col("doc_id") % 2 === 0)
        .unionByName(quoted(bench0, 1)).unionByName(quoted(bench1, 3))
        .select(col("doc_id"), col("text"))
        .select((col("doc_id") + lit((k + 1) * 1000000L)).as("doc_id"),
          col("text"))
      val stateDir = scratchDir("stream_decontam", dir)
      val sdc = new graft.streaming.StreamingDecontamination(s, stateDir,
        "doc_id", "text")
      sdc.seed(bench0, "text")
      val b0 = sdc.admit(batchDf(0), 0L).withColumn("batch", lit(0))
      sdc.addBenchmark(bench1, "text", 1L)
      sdc.compact(upTo = 1L)
      val rest = (1 until 3).map { k =>
        sdc.admit(batchDf(k), (k + 1).toLong).withColumn("batch", lit(k + 1))
      }
      (b0 +: rest).reduce(_ unionByName _)
        .select(col("batch"), col("id"), col("n_grams"), col("n_hits"),
          col("contaminated"))
        .orderBy(col("batch"), col("id"))
    },

    // --- the exact-substring twin's replay: seed docs %5==0, three
    //     admitted batches whose bodies re-quote their base doc (plus a
    //     ' bK' suffix so no batch is byte-identical) and whose %4==1
    //     members splice a 60-char span of a SEED doc — every batch
    //     pairs with the seed corpus and all earlier batches through
    //     verbatim 40-char windows, proving the gram state accumulates --
    "stream_substring_replay" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val base = d.filter(col("doc_id") % 5 === 0)
      val spans = d.filter(col("doc_id") < 20)
        .select((col("doc_id") % 20).as("bid"),
          substring(col("text"), 1, 60).as("span"))
      def batchDf(k: Int) = {
        val plain = base.filter(col("doc_id") % 4 =!= 1)
          .select(col("doc_id"), concat(col("text"), lit(s" b$k")).as("text"))
        val spliced = base.filter(col("doc_id") % 4 === 1)
          .withColumn("bid", col("doc_id") % 20)
          .join(spans, "bid")
          .select(col("doc_id"),
            concat(col("text"), lit(s" b$k "), col("span")).as("text"))
        plain.unionByName(spliced)
          .select((col("doc_id") + lit((k + 1) * 1000000L)).as("doc_id"),
            col("text"))
      }
      val stateDir = scratchDir("stream_substr", dir)
      val ssd = new graft.streaming.StreamingSubstringDedup(s, stateDir,
        "doc_id", "text", k = 40)
      ssd.seed(base)
      (0 until 3).map { k =>
        val p = ssd.admit(batchDf(k), k.toLong).withColumn("batch", lit(k))
        if (k == 0) ssd.compact(upTo = 0L)
        p
      }.reduce(_ unionByName _)
        .select(col("batch"), col("ref_id"), col("new_id"))
        .orderBy(col("batch"), col("ref_id"), col("new_id"))
    },

    // --- brute-force cosine top-k ----------------------------------------
    "sim_topk_bruteforce" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20), k = 5)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- LSH-bucketed top-k (oracle recomputes bands from plane literals) -
    "sim_topk_lsh" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.lshTopK(e, e.filter(col("vec_id") < 20), k = 5, dims = 64)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- IVF-cell top-k (oracle re-trains the same centroids in SQL) -----
    "sim_topk_ivf" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), k = 5,
          nCells = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- PQ/ADC top-k (oracle re-trains all eight subspace codebooks,
    //     re-encodes, replays the ADC lookup scoring and the exact
    //     re-rank in SQL) --------------------------------------------------
    "sim_topk_pq" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.pqTopK(e, e.filter(col("vec_id") < 20), k = 5,
          m = 8, kCodes = 16, rerank = 8)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- the persisted-index SERVING paths under oracle: train once,
    //     save, LOAD, and answer with the loaded index (ivfTopKWithIndex
    //     / pqTopKWithBooks — no retraining on the query path). Training
    //     is deterministic, so the oracle re-derives the exact persisted
    //     centroids/codebooks from the base table and must match the
    //     round-tripped index hash-for-hash ----------------------------
    "sim_topk_ivf_indexed" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val idxDir = scratchDir("ivf_index", dir)
      Similarity.IvfIndex.save(Similarity.trainCentroids(e, nCells = 16), s, idxDir)
      val loaded = Similarity.IvfIndex.load(s, idxDir)
      Similarity.ivfTopKWithIndex(e, e.filter(col("vec_id") < 20), k = 5,
          loaded, nprobe = 4)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- the persisted-inverted-list twin: the corpus is written out
    //     assigned + partitioned by cell, and the query batch scans
    //     ONLY its probed cells' partitions (static isin partition
    //     prune) — no per-batch corpus re-assignment. Same centroids,
    //     same results as sim_topk_ivf; different physics -------------
    "sim_topk_ivf_persisted" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val idxDir = scratchDir("ivf_inv_index", dir)
      Similarity.IvfIndex.saveAssigned(e,
        Similarity.trainCentroids(e, nCells = 16), idxDir)
      Similarity.ivfTopKFromIndex(s, idxDir, e.filter(col("vec_id") < 20),
          k = 5, nprobe = 4)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    "sim_topk_pq_indexed" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val idxDir = scratchDir("pq_index", dir)
      Similarity.PqIndex.save(Similarity.trainPq(e, m = 8, k = 16), s, idxDir)
      val books = Similarity.PqIndex.load(s, idxDir)
      Similarity.pqTopKWithBooks(e, e.filter(col("vec_id") < 20), k = 5,
          books, rerank = 8)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- the standing-index ADMISSION lifecycle: the index is built on
    //     the even-id half only (train + saveAssigned), the odd half is
    //     APPENDED against the frozen centroids (no retrain, no rewrite
    //     — one new file per touched cell), and the query path answers
    //     over the union. The oracle trains its centroids on the even
    //     half and assigns the union — exactly what appendAssigned must
    //     reproduce ------------------------------------------------------
    "sim_topk_ivf_appended" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val seedHalf = e.filter(col("vec_id") % 2 === 0)
      val fresh = e.filter(col("vec_id") % 2 =!= 0)
      val idxDir = scratchDir("ivf_app_index", dir)
      Similarity.IvfIndex.saveAssigned(seedHalf,
        Similarity.trainCentroids(seedHalf, nCells = 16), idxDir)
      Similarity.IvfIndex.appendAssigned(fresh, idxDir)
      Similarity.ivfTopKFromIndex(s, idxDir, e.filter(col("vec_id") < 20),
          k = 5, nprobe = 4)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- the IVF-PQ serving composition (IVFADC): probe cells from the
    //     persisted index, ADC-score CODES within probed cells only
    //     (LUTs as broadcast DATA on a cell equi-join — codegen'd BHJ,
    //     plan size O(1) in batch size), exact re-rank from the same
    //     pruned partitions. The oracle composes the deterministic IVF
    //     cell derivation with the PQ codebook derivation ---------------
    "sim_topk_ivfpq" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val idxDir = scratchDir("ivfpq_index", dir)
      Similarity.IvfPqIndex.save(e,
        Similarity.trainCentroids(e, nCells = 16),
        Similarity.trainPq(e, m = 8, k = 16), idxDir)
      Similarity.ivfPqTopK(s, idxDir, e.filter(col("vec_id") < 20),
          k = 5, nprobe = 4, rerank = 8)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- the composed-index ADMISSION lifecycle: the IVFADC index is
    //     built on the even-id half (centroids AND codebooks trained
    //     there), the odd half is APPENDED against both frozen artifacts
    //     (assign + encode, one new file per touched cell), and the
    //     serving path answers over the union ------------------------
    "sim_topk_ivfpq_appended" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val seedHalf = e.filter(col("vec_id") % 2 === 0)
      val fresh = e.filter(col("vec_id") % 2 =!= 0)
      val idxDir = scratchDir("ivfpq_app_index", dir)
      Similarity.IvfPqIndex.save(seedHalf,
        Similarity.trainCentroids(seedHalf, nCells = 16),
        Similarity.trainPq(seedHalf, m = 8, k = 16), idxDir)
      Similarity.IvfPqIndex.append(fresh, idxDir)
      Similarity.ivfPqTopK(s, idxDir, e.filter(col("vec_id") < 20),
          k = 5, nprobe = 4, rerank = 8)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- language identification -----------------------------------------
    "text_langid" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .orderBy(col("doc_id"))
    },

    // --- HTML-to-text extraction: docs wrapped in markup with script/
    //     style blocks (holding tag-like text), comments, and entities —
    //     named + numeric (decimal/hex/leading-zero/supplementary) decode,
    //     with overflow-length, surrogate, empty-payload, and amp-escaped
    //     references left literal ---------------------------------------
    "text_strip_html" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 500)
      val page = concat(
        lit("<html><head><style>p { color: red; }</style>" +
          "<script>if (x < 2) { alert(\"hi\"); }</script></head>" +
          "<body><h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><!-- hidden comment --><p>A &amp; B &lt;tag&gt; " +
          "&quot;q&quot; &#39;s&#39;&nbsp;" +
          "caf&#233; h&#xE9;llo &#X41;&#0233; gr&#128512; " +
          "bad&#12345678; sur&#55296; no&#x; esc&#38;lt; amp&amp;#65; " +
          "end</p></body></html>"))
      d.select(col("doc_id"),
          TextAnalysis.stripHtml(page).as("clean"))
        .orderBy(col("doc_id"))
    },

    // --- Unicode script composition (mostly-Latin gate): every fourth
    //     doc gets a Greek / Cyrillic / Arabic suffix so each listed
    //     script has non-zero mass; zh docs exercise the CJK block ------
    "text_scripts" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.filter(col("doc_id") < 500).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" αβγ"))
            .when(col("doc_id") % 4 === 1,
              lit(" привет"))
            .when(col("doc_id") % 4 === 2,
              lit(" مرحبا"))
            .otherwise(lit(""))).as("text"))
      corpus.select(col("doc_id") +:
          TextAnalysis.scriptRatioCols(col("text")).map { case (n, c) =>
            round(c, 6).as(n)
          }: _*)
        .orderBy(col("doc_id"))
    },

    // --- quality scoring ---------------------------------------------------
    "text_quality" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_pieces"),
          round(TextAnalysis.alphaRatio(col("text")), 6).as("alpha_ratio"),
          round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextAnalysis.meanTokenLen(col("text")), 6).as("mean_token_len"),
          TextAnalysis.stopwordHits(col("text")).as("stop_hits"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },

    // --- repetition filter (corpus-cleaning: drop keyword-stuffed /
    //     degenerate docs by duplicate-word fraction) ----------------------
    "text_repetition" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_words"),
          round(TextAnalysis.wordRepetitionRatio(col("text")), 6).as("dup_ratio"))
        .withColumn("keep", col("dup_ratio") < 0.8)
        .orderBy(col("doc_id"))
    },

    // --- corpus snapshot diff (incremental crawl bookkeeping): the new
    //     snapshot drops every 17th doc, edits every 13th, adds re-id'd
    //     copies of every 11th — each identity classifies as
    //     added/removed/changed/unchanged by byte fingerprint ----------
    "corpus_diff" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val newSnap = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(lit("new "), col("text")).as("text")))
      Dedup.snapshotDiff(d, newSnap, "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // --- the composed curation pipeline (capstone): exact-dedup the
    //     corpus, drop low-quality docs, roll up by predicted language —
    //     every stage individually oracle-proven, composed here ----------
    "corpus_curate" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.dropExact(corpus, col("text"), col("doc_id"))
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.5)
        .withColumn("pred", TextAnalysis.langId(col("text")))
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_quality"))
        .orderBy(col("pred"))
    },

    // --- benchmark decontamination: docs sharing an 8-gram with the
    //     benchmark set (benchmark = docs < 20; contamination planted by
    //     appending a benchmark span to 100 shifted docs) ----------------
    "text_decontaminate" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val words = graft.operators.TextAnalysis.canonToks(col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val spans = bench.select(col("doc_id").as("bid"),
        concat_ws(" ", slice(words, 1, 8)).as("span"))
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans, "bid")
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      val corpus = d.union(planted)
      TextAnalysis.contaminatedDocs(corpus, "doc_id", "text", bench, "text")
        .orderBy(col("doc_id"))
    },

    // --- same decontamination, Bloom-pruned: the big-benchmark regime
    //     where the gram set can't broadcast as a hash relation. The
    //     Bloom only prunes the corpus exchange (false positives are
    //     removed by the exact semi-join), so the oracle is literally
    //     text_decontaminate's SQL -----------------------------------
    "text_decontaminate_bloom" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val words = graft.operators.TextAnalysis.canonToks(col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val spans = bench.select(col("doc_id").as("bid"),
        concat_ws(" ", slice(words, 1, 8)).as("span"))
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans, "bid")
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      val corpus = d.union(planted)
      TextAnalysis.contaminatedDocsBloom(corpus, "doc_id", "text", bench,
        "text")
        .orderBy(col("doc_id"))
    },

    // --- contamination fraction report: per-doc share of distinct
    //     8-grams hitting the benchmark set (same planted corpus as
    //     text_decontaminate — planted docs score low-but-nonzero,
    //     benchmark members score 1.0) ----------------------------------
    "text_contamination_frac" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val words = TextAnalysis.canonToks(col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val spans = bench.select(col("doc_id").as("bid"),
        concat_ws(" ", slice(words, 1, 8)).as("span"))
      val planted = d.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans, "bid")
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"))
      val corpus = d.union(planted)
      TextAnalysis.contaminationStats(corpus, "doc_id", "text", bench, "text")
        .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
          round(col("contamination"), 6).as("contamination"))
        .orderBy(col("doc_id"))
    },

    // --- PII scrubbing (planted emails/IPs/long numbers -> typed tokens;
    //     oracle recomputes the scrub with the identical portable regexes) -
    "text_pii_scrub" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" contact bob.smith+x@mail.example.org " +
            "or 10.42.0.255 ref 9876543210123")).as("text")))
      corpus.select(col("doc_id"),
          TextAnalysis.piiCount(col("text"), TextAnalysis.piiEmailRe).as("n_emails"),
          TextAnalysis.piiCount(col("text"), TextAnalysis.piiIpv4Re).as("n_ipv4"),
          TextAnalysis.piiCount(col("text"), TextAnalysis.piiLongNumRe).as("n_longnums"),
          TextAnalysis.scrubPii(col("text")).as("scrubbed"))
        .orderBy(col("doc_id"))
    },

    // --- document fingerprinting ------------------------------------------
    "text_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // --- NFC-composed fingerprinting: every doc planted TWICE, once with
    //     a precomposed suffix (é, 가) and once with its decomposed twin
    //     (e+U+0301, jamo pair) — with NFC in the key both collapse onto
    //     ONE fingerprint group (n=2 per group); the byte-level default
    //     would keep them apart. Oracle: DuckDB nfc_normalize before the
    //     canonical md5 -------------------------------------------------
    "text_fingerprint_nfc" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"),
          concat(col("text"), lit(" caf\u00e9 \uac00")).as("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" cafe\u0301 \u1100\u1161")).as("text")))
      corpus.select(TextAnalysis.fingerprintNfc(col("text")).as("fp"),
          col("doc_id"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("fp"))
    },

    // --- multimodal byte-metadata pass (binary envelope plumbing) ---------
    "mm_meta" -> { (s, dir) =>
      val assets = Tables(s, dir).documents
        .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
          lit("text/plain").as("mime"),
          col("text").cast(BinaryType).as("content"),
          map().cast(MapType(StringType, StringType)).as("meta"))
      Multimodal.withByteMetadata(assets)
        .select(col("asset_id"), col("byte_len"), col("sha256"), col("magic"))
        .orderBy(col("asset_id"))
    },

    // --- multimodal decode-stub features: the stub accumulates exact
    //     integer byte sums, so the oracle recomputes f0 from the same
    //     bytes (the real-codec swap point stays mapPartitions) -----------
    "mm_features" -> { (s, dir) =>
      val assets = Multimodal.syntheticAssets(
        Tables(s, dir).documents.select(col("doc_id").as("asset_id")))
      val feats = Multimodal.extractFeatures(assets)
      feats.toDF()
        .select(col("asset_id"), col("byte_len"),
          round(element_at(col("features"), 1).cast(DoubleType), 6).as("f0"))
        .orderBy(col("asset_id"))
    },

    // --- REAL image decode: deterministic 24-bit BMP fixtures go through
    //     the actual javax.imageio path (8x8 bases + their 2x nearest-
    //     upscaled 16x16 twins, which must dHash identically), plus
    //     non-image payloads that must be DROPPED, not crash; the oracle
    //     regenerates every pixel from the id arithmetic alone ----------
    "mm_decode_real" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      // content is built BEFORE the id shift (a same-select shift would
      // lateral-alias into the pixel arithmetic)
      def bmp(shift: Long, size: Int) = ids
        .select(col("asset_id"),
          Multimodal.bmpContent(col("asset_id"), size, lit(false)).as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val junk = ids.filter(col("asset_id") % 3 === 0)
        .select(col("asset_id"),
          unhex(lpad(hex(col("asset_id") * 2654435761L), 16, "0")).as("content"))
        .select((col("asset_id") + 3000000L).as("asset_id"), col("content"))
      Multimodal.decodeImages(
          bmp(0L, 8).unionByName(bmp(1000000L, 16)).unionByName(junk)).toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("gray_sum"), col("gray_min"), col("gray_max"),
          lpad(hex(col("dhash")), 16, "0").as("dhash_hex"))
        .orderBy(col("asset_id"))
    },

    // --- perceptual-hash image dedup: banded dHash near-dup pairs over
    //     base images, their scale twins (hamming 0 by construction —
    //     they COLLAPSE into a rep+clique under the default clique-safe
    //     path) and noise twins (a two-cell luma bump flips a few
    //     gradient bits — they pair with the representatives) -----------
    "mm_phash_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      def bmp(shift: Long, size: Int, noisy: Boolean) = ids
        .select(col("asset_id"),
          Multimodal.bmpContent(col("asset_id"), size, lit(noisy)).as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val decoded = Multimodal.decodeImages(bmp(0L, 8, noisy = false)
        .unionByName(bmp(1000000L, 16, noisy = false))
        .unionByName(bmp(2000000L, 8, noisy = true))).toDF()
      Multimodal.imageNearDups(decoded, maxHamming = 6, wideRecall = true)
        .select(col("a"), col("b"), col("hamming"),
          col("clique_a"), col("clique_b"))
        .orderBy(col("a"), col("b"))
    },

    // --- the DEFAULT (scale-safe) banding: 4×16-bit bands, exact recall
    //     for hamming <= 3 — the tightest-candidate shape; the wideRecall
    //     mode above adds 1-bit band probing for exact 4..7-bit recall --
    "mm_phash_dedup_tight" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      def bmp(shift: Long, size: Int, noisy: Boolean) = ids
        .select(col("asset_id"),
          Multimodal.bmpContent(col("asset_id"), size, lit(noisy)).as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val decoded = Multimodal.decodeImages(bmp(0L, 8, noisy = false)
        .unionByName(bmp(1000000L, 16, noisy = false))
        .unionByName(bmp(2000000L, 8, noisy = true))).toDF()
      Multimodal.imageNearDups(decoded)
        .select(col("a"), col("b"), col("hamming"),
          col("clique_a"), col("clique_b"))
        .orderBy(col("a"), col("b"))
    },

    // --- REAL audio decode: deterministic PCM WAV fixtures go through the
    //     actual RIFF chunk-walking parse (16-bit bases, their exact-2x
    //     gain twins — which must fingerprint identically, the volume
    //     invariance — and an 8-bit variant), plus non-audio payloads
    //     that must DROP; the oracle regenerates every sample from the id
    //     arithmetic alone -----------------------------------------------
    "mm_audio_decode" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      // content before the id shift (lateral-alias hazard, as mm_decode)
      def wav(shift: Long, gain: Int, bits: Int) = ids
        .select(col("asset_id"),
          Multimodal.wavContent(col("asset_id"), 260, gain, lit(false), bits)
            .as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val junk = ids.filter(col("asset_id") % 3 === 0)
        .select(col("asset_id"),
          unhex(lpad(hex(col("asset_id") * 2654435761L), 16, "0")).as("content"))
        .select((col("asset_id") + 3000000L).as("asset_id"), col("content"))
      Multimodal.decodeAudio(wav(0L, 1, 16).unionByName(wav(1000000L, 2, 16))
          .unionByName(wav(2000000L, 1, 8)).unionByName(junk)).toDF()
        .select(col("asset_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("abs_sum"), col("peak"),
          lpad(hex(col("afp")), 16, "0").as("afp_hex"))
        .orderBy(col("asset_id"))
    },

    // --- energy-fingerprint audio dedup: banded near-dup pairs over base
    //     recordings, their gain twins (hamming 0 by construction) and
    //     noise twins (a +300 bump over a 16-sample window flips a few
    //     energy-gradient bits) ------------------------------------------
    "mm_audio_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      def wav(shift: Long, gain: Int, noisy: Boolean) = ids
        .select(col("asset_id"),
          Multimodal.wavContent(col("asset_id"), 260, gain, lit(noisy))
            .as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val decoded = Multimodal.decodeAudio(wav(0L, 1, noisy = false)
        .unionByName(wav(1000000L, 2, noisy = false))
        .unionByName(wav(2000000L, 1, noisy = true))).toDF()
      Multimodal.audioNearDups(decoded, maxHamming = 7, wideRecall = true)
        .select(col("a"), col("b"), col("hamming"),
          col("clique_a"), col("clique_b"))
        .orderBy(col("a"), col("b"))
    },

    // --- REAL video demux: deterministic uncompressed AVI fixtures go
    //     through the actual RIFF container walk (hdrl/avih + strl/strf +
    //     movi raw-DIB frames) into per-frame luma stats + dHash; junk
    //     payloads DROP; the oracle regenerates every frame's pixels from
    //     the id arithmetic alone ----------------------------------------
    "mm_video_demux" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      def avi(shift: Long, noisy: Boolean) = ids
        .select(col("asset_id"),
          Multimodal.aviContent(col("asset_id"), 10, 8, lit(noisy))
            .as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val junk = ids.filter(col("asset_id") % 3 === 0)
        .select(col("asset_id"),
          unhex(lpad(hex(col("asset_id") * 2654435761L), 16, "0")).as("content"))
        .select((col("asset_id") + 3000000L).as("asset_id"), col("content"))
      Multimodal.decodeVideoFrames(avi(0L, noisy = false)
          .unionByName(avi(1000000L, noisy = true)).unionByName(junk)).toDF()
        .select(col("asset_id"), col("frame_id"), col("width"), col("height"),
          col("gray_sum"), lpad(hex(col("dhash")), 16, "0").as("dhash_hex"))
        .orderBy(col("asset_id"), col("frame_id"))
    },

    // --- video near-dup: frame-slot-aligned dHash matching over base
    //     videos, byte-identical copies (identical frame-hash sequences —
    //     they COLLAPSE into a rep+clique under the default clique-safe
    //     path) and touched-up copies (frames 0/5 bumped; the 80% bar
    //     still links them to the representatives) ----------------------
    "mm_video_dedup" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      def avi(shift: Long, noisy: Boolean) = ids
        .select(col("asset_id"),
          Multimodal.aviContent(col("asset_id"), 10, 8, lit(noisy))
            .as("content"))
        .select((col("asset_id") + shift).as("asset_id"), col("content"))
      val frames = Multimodal.decodeVideoFrames(avi(0L, noisy = false)
        .unionByName(avi(1000000L, noisy = false))
        .unionByName(avi(2000000L, noisy = true))).toDF()
      Multimodal.videoNearDups(frames, maxHamming = 6, minMatchPct = 80,
          wideRecall = true)
        .select(col("a"), col("b"), col("n_matched"), col("n_a"), col("n_b"),
          col("clique_a"), col("clique_b"))
        .orderBy(col("a"), col("b"))
    },

    // --- scene-change detection: sceneLen=4 fixtures give static scenes
    //     [0..3][4..7][8..9]; cuts must land exactly at 0/4/8 with
    //     hamming 0 inside scenes; the oracle recomputes every frame
    //     hash and the lag ----------------------------------------------
    "mm_video_scenes" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      val avi = ids.select(col("asset_id"),
        Multimodal.aviContent(col("asset_id"), 10, 8, lit(false), sceneLen = 4)
          .as("content"))
      Multimodal.sceneChanges(
          Multimodal.decodeVideoFrames(avi).toDF(), maxHamming = 2)
        .select(col("asset_id"), col("frame_id"), col("hamming_prev"),
          col("is_cut"))
        .orderBy(col("asset_id"), col("frame_id"))
    },

    // --- silence segmentation: a muted third quarter splits each track
    //     at windows 33..47, and slow sawtooths also dip under the 25%-
    //     of-mean bar at zero crossings — the oracle replays the exact
    //     integer threshold and run-numbering ---------------------------
    "mm_audio_segments" -> { (s, dir) =>
      val ids = Tables(s, dir).documents.filter(col("doc_id") < 300)
        .select(col("doc_id").as("asset_id"))
      val assets = ids.select(col("asset_id"),
        Multimodal.wavContent(col("asset_id"), 260, mute = lit(true))
          .as("content"))
      Multimodal.audioSegments(
          Multimodal.audioWindows(assets).toDF(), silencePctOfMean = 25)
        .select(col("asset_id"), col("seg_id"), col("start_window"),
          col("end_window"), col("n_windows_seg"), col("energy_sum"))
        .orderBy(col("asset_id"), col("seg_id"))
    },

    // --- dedup clustering: connected components over near-dup pairs +
    //     canonical-survivor selection. Edge topology mixes 3-node CHAINS
    //     (transitivity — pairs alone can't dedup these) with hub STARS
    //     merging many chains, so the star alternation must actually
    //     propagate labels; the oracle recomputes components with a
    //     recursive transitive closure ----------------------------------
    "dedup_cluster" -> { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(col("doc_id")).filter(col("doc_id") < 300)
      val base = d.filter(col("doc_id") < 200)
      val corpus = d
        .union(base.select((col("doc_id") + 1000000).as("doc_id")))
        .union(base.select((col("doc_id") + 2000000).as("doc_id")))
      val pairs = base.select(col("doc_id").as("a"),
          (col("doc_id") + 1000000).as("b"))
        .union(base.select((col("doc_id") + 1000000).as("a"),
          (col("doc_id") + 2000000).as("b")))
        .union(d.filter(col("doc_id") < 50).select(col("doc_id").as("a"),
          (lit(5000) + col("doc_id") % 10).as("b")))
      Dedup.cluster(corpus, pairs).orderBy(col("id"))
    },

    // --- END-TO-END dedup: minhash near-dup pairs closed into clusters
    //     with canonical-survivor selection — the composed production
    //     pipeline (pairs alone don't dedup); oracle recomputes pairs AND
    //     the transitive closure -----------------------------------------
    "dedup_cluster_minhash" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val pairs = Dedup.nearDupPairsMinhash(corpus, "doc_id", "text",
        n = 3, bands = 8, rows = 4, threshold = 0.9)
      val out = Dedup.cluster(corpus.select(col("doc_id")), pairs)
        .orderBy(col("id"))
      // connectedComponents checkpoints the edge set eagerly, so the
      // (pinned-path) pair table is fully consumed by now: release it
      // here instead of leaking result-sized blocks for the session
      // (no-op on the un-pinned small-corpus path)
      pairs.unpersist()
      out
    },

    // --- deterministic train/val/test split: md5-bucketed, reproducible
    //     across engines — the oracle recomputes every bucket ------------
    "sample_split" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.assignSplit(d, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("id_min"),
          max(col("doc_id")).as("id_max"))
        .orderBy(col("split"))
    },

    // --- stratified deterministic sampling: per-language keep fractions
    //     (the corpus-mixing knob) ---------------------------------------
    "sample_stratified" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.stratifiedSample(d, col("doc_id"), col("lang"),
          Map("en" -> 0.5, "zh" -> 0.1), defaultFraction = 0.25)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    },

    // --- data mixing toward target language weights: over-represented
    //     strata downsample (en), under-represented keep whole, strata
    //     with no weight drop (es) --------------------------------------
    "sample_mixture" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.mixToWeights(d, col("doc_id"), col("lang"),
          Map("en" -> 0.25, "de" -> 0.25, "fr" -> 0.25, "zh" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    },

    // --- temperature-based mixture reweighting (XLM-style): T=2 targets
    //     shares ∝ sqrt(n_s) — sqrt is correctly-rounded IEEE in both
    //     engines, so the derived thresholds recompute exactly in SQL --
    "sample_mixture_temp" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.mixToTemperature(d, col("doc_id"), col("lang"),
          temperature = 2.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    },

    // --- temperature mixture at T=4: shares ∝ n^(1/4) = sqrt(sqrt(n)) —
    //     the two-sqrt chain keeps the oracle on correctly-rounded IEEE
    //     ops (pow's 1-ulp bound would not guarantee bit-parity) --------
    "sample_mixture_temp4" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.mixToTemperature(d, col("doc_id"), col("lang"),
          temperature = 4.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    },

    // --- corpus vocabulary statistics: token tf/df, top-100 -------------
    "text_vocab" -> { (s, dir) =>
      TextAnalysis.vocabStats(Tables(s, dir).documents, "doc_id", "text")
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    },

    // --- token-budget chunking (sequence packing) ------------------------
    "text_chunk" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 100)
      TextAnalysis.chunkByTokens(d, "doc_id", "text", maxTokens = 32)
        .orderBy(col("id"), col("chunk_id"))
    },

    // --- sliding-window chunking: 32-token windows every 24 tokens ------
    "text_chunk_sliding" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 100)
      TextAnalysis.chunkByTokensSliding(d, "doc_id", "text",
          window = 32, stride = 24)
        .orderBy(col("id"), col("chunk_id"))
    },

    // --- global sequence packing: every chunk's global token offset via
    //     a distributed prefix sum (range exchange + per-partition
    //     running sums — never a single-partition global window) --------
    "text_pack" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val chunks = TextAnalysis.chunkByTokens(d, "doc_id", "text", maxTokens = 32)
      TextAnalysis.packSequences(chunks, tokensPerSeq = 512)
        .orderBy(col("id"), col("chunk_id"))
    },

    // --- int8 embedding quantization (vector-store compression): the
    //     oracle recomputes every quantized element, compared through
    //     exact integer aggregates --------------------------------------
    "sim_quantize_int8" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Similarity.quantizeInt8(e)
        .select(col("id"), round(col("scale"), 6).as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
        .orderBy(col("id"))
    },

    // --- as-of join: each purchase event picks up the user's latest
    //     click at-or-before it (point-in-time lookup; the oracle is
    //     DuckDB's native ASOF JOIN) -------------------------------------
    "q_asof_join" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val left = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.filter(col("event_type") === "click")
        .select(col("event_id").as("b_event_id"), col("user_id"),
          col("ts"), col("value").as("b_value"))
      Joins.asOf(left, right, Seq("user_id"), "ts",
          rightCols = Seq("b_event_id", "b_value"), ordCol = "b_event_id")
        .select(col("event_id"), col("user_id"), col("b_event_id"),
          round(col("b_value"), 6).as("b_value"))
        .orderBy(col("event_id"))
    },

    // --- as-of with tolerance: matches staler than 10 min nullify
    //     (pandas merge_asof tolerance semantics) -------------------------
    "q_asof_tolerance" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val left = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.filter(col("event_type") === "click")
        .select(col("event_id").as("b_event_id"), col("user_id"),
          col("ts"), col("value").as("b_value"))
      Joins.asOf(left, right, Seq("user_id"), "ts",
          rightCols = Seq("b_event_id", "b_value"), ordCol = "b_event_id",
          toleranceSec = Some(600.0))
        .select(col("event_id"), col("user_id"), col("b_event_id"),
          round(col("b_value"), 6).as("b_value"))
        .orderBy(col("event_id"))
    },

    // --- temporal (SCD-2) join: each event picks the dimension VERSION
    //     whose [valid_from, valid_to) covers its ts; events before the
    //     first version or after the closed last one keep nulls ---------
    "q_temporal_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val e = t.events.select(col("event_id"), col("ts"),
        (col("user_id") % 25).as("k"))
      val base = lit("2024-01-03 00:00:00").cast("timestamp_ntz")
      val dim = t.nation
        .select(col("n_nationkey").cast("long").as("k"))
        .withColumn("version", explode(sequence(lit(0), lit(2))))
        .withColumn("valid_from",
          base + expr("make_dt_interval(8 * version, 0, 0, 0)"))
        .withColumn("valid_to",
          base + expr("make_dt_interval(8 * (version + 1), 0, 0, 0)"))
        .withColumn("rate", col("k") * 100 + col("version"))
      Joins.temporal(e, dim, Seq("k"), "ts", "valid_from", "valid_to",
          rightCols = Seq("rate", "version", "valid_to"), ordCol = "version")
        .select(col("event_id"), col("k"), col("rate"), col("version"))
        .orderBy(col("event_id"))
    },

    // --- banded range join: events matched to OVERLAPPING value bands
    //     (multi-match rows emitted once per band; bucket width 16 is
    //     deliberately unaligned with the 20-25 wide bands) -------------
    "q_range_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val e = t.events.select(col("event_id"), col("value"))
      val bands = t.nation
        .select(col("n_nationkey").cast("long").as("band_id"))
        .withColumn("lo", col("band_id").cast("double") * 20.0)
        .withColumn("hi",
          col("lo") + 20.0 + (col("band_id") % 3).cast("double") * 5.0)
      Joins.range(e, bands, "value", "lo", "hi", bucketWidth = 16.0)
        .select(col("event_id"), col("band_id"))
        .orderBy(col("event_id"), col("band_id"))
    },

    // --- as-of, forward direction: each purchase picks up the user's
    //     EARLIEST click at-or-after it (reversed carry window; oracle is
    //     DuckDB ASOF with l.ts <= r.ts) --------------------------------
    "q_asof_forward" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val left = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.filter(col("event_type") === "click")
        .select(col("event_id").as("b_event_id"), col("user_id"),
          col("ts"), col("value").as("b_value"))
      Joins.asOf(left, right, Seq("user_id"), "ts",
          rightCols = Seq("b_event_id", "b_value"), ordCol = "b_event_id",
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("b_event_id"),
          round(col("b_value"), 6).as("b_value"))
        .orderBy(col("event_id"))
    },

    // --- as-of, nearest direction: closer of the backward/forward
    //     candidates, ties to backward (oracle recombines two DuckDB
    //     ASOF joins with the same interval-distance rule) --------------
    "q_asof_nearest" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val left = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = e.filter(col("event_type") === "click")
        .select(col("event_id").as("b_event_id"), col("user_id"),
          col("ts"), col("value").as("b_value"))
      Joins.asOf(left, right, Seq("user_id"), "ts",
          rightCols = Seq("b_event_id", "b_value"), ordCol = "b_event_id",
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("b_event_id"),
          round(col("b_value"), 6).as("b_value"))
        .orderBy(col("event_id"))
    },

    // --- as-of, strict inequality (pandas allowExactMatches=false): a
    //     click SELF-asof — every left row has an exact-ts match (itself)
    //     that strict mode must skip, falling back to the user's PREVIOUS
    //     click (oracle: DuckDB ASOF with l.ts > r.ts) ------------------
    "q_asof_strict" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val clicks = e.filter(col("event_type") === "click")
      val left = clicks.select(col("event_id"), col("user_id"), col("ts"))
      val right = clicks.select(col("event_id").as("b_event_id"),
        col("user_id"), col("ts"), col("value").as("b_value"))
      Joins.asOf(left, right, Seq("user_id"), "ts",
          rightCols = Seq("b_event_id", "b_value"), ordCol = "b_event_id",
          allowExactMatches = false)
        .select(col("event_id"), col("user_id"), col("b_event_id"),
          round(col("b_value"), 6).as("b_value"))
        .orderBy(col("event_id"))
    },

    // --- the FULL curation pipeline capstone: exact dedup -> Gopher rule
    //     filter -> PII scrub -> per-source cap -> train/val split ->
    //     per-(split, source) token accounting. Six oracle-proven stages
    //     composed end-to-end — the 100 TB pre-training data job --------
    "corpus_pipeline" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"), col("source"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("source")))
      val scrubbed = Dedup.dropExact(corpus, col("text"), col("doc_id"))
        .filter(TextAnalysis.gopherKeep(col("text")))
        .withColumn("text", TextAnalysis.scrubPii(col("text")))
      val capped = Sampling.capPerGroup(scrubbed, col("doc_id"), col("source"),
          maxN = 20)
        .select(col("id").as("doc_id"))
      Sampling.assignSplit(scrubbed.join(capped, "doc_id"), col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.1))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("split"), col("source"))
    },

    // --- the capstone STREAMING: the same stage list on a real
    //     Structured Streaming source (MemoryStream -> foreachBatch via
    //     StreamingCuration.attach), decontamination as the standing
    //     stateful gate. Batch fixture plants every stage's work: %4==1
    //     docs quote the SEED benchmark (always dropped), %4==3 docs
    //     quote a SECOND release folded in mid-stream at batch id 1
    //     (dropped from batch 2 on — the state-accumulation proof),
    //     %4==2 docs re-appear as +500000 exact copies (dedup drops
    //     them), and the per-batch rollup rides cap + split. The
    //     driver-side collect is the TEST HARNESS feeding MemoryStream,
    //     not the operator: production attaches to a Kafka/file source
    //     and nothing in StreamingCuration collects -------------------
    "corpus_pipeline_stream" -> { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("text"), col("source"))
      val bench0 = d.filter(col("doc_id") < 20)
      val bench1 = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      def spans(bench: DataFrame) = bench.select(
        (col("doc_id") % 20).as("bid"),
        concat_ws(" ",
          slice(TextAnalysis.canonToks(col("text")), 1, 8)).as("span"))
      val base = d.filter(col("doc_id") % 5 === 0)
      def quoted(bench: DataFrame, m: Int) = base
        .filter(col("doc_id") % 4 === m)
        .withColumn("bid", col("doc_id") % 20)
        .join(spans(bench), "bid")
        .select(col("doc_id"),
          concat(col("text"), lit(" "), col("span")).as("text"),
          col("source"))
      val raw = base.filter(col("doc_id") % 4 =!= 1 && col("doc_id") % 4 =!= 3)
        .unionByName(base.filter(col("doc_id") % 4 === 2)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
            col("source")))
        .unionByName(quoted(bench0, 1))
        .unionByName(quoted(bench1, 3))
      def batchRows(k: Int): Seq[(Long, String, String)] = raw
        .select((col("doc_id") + lit((k + 1) * 1000000L)).as("doc_id"),
          col("text"), col("source"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val root = scratchDir("stream_capstone", dir)
      // a stale checkpoint + a fresh MemoryStream is an unrunnable pair
      // (committed offsets point at data the new source never had) — a
      // re-run inside one process must start clean
      val rootPath = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(rootPath))
        java.nio.file.Files.walk(rootPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      val outDir = s"$root/out"
      val sc = new graft.streaming.StreamingCuration(s, s"$root/state",
        "doc_id", "text", "source")
      sc.seed(bench0, "text")
      val mem = MemoryStream[(Long, String, String)]
      val q = sc.attach(mem.toDF().toDF("doc_id", "text", "source"),
        outDir, s"$root/ck").start()
      mem.addData(batchRows(0)); q.processAllAvailable()
      // release 1 folds in at id 1: stream batch 1 admits with state
      // `before = 1` (doesn't see it), batch 2 does
      sc.addBenchmark(bench1, "text", 1L)
      mem.addData(batchRows(1)); q.processAllAvailable()
      mem.addData(batchRows(2)); q.processAllAvailable()
      q.stop()
      s.read.parquet(outDir)
        .select(col("batch").cast("int").as("batch"), col("split"),
          col("source"), col("n"), col("n_tokens"))
        .orderBy(col("batch"), col("split"), col("source"))
    },

    // --- SemDeDup: k-means cells (deterministic trainer) -> within-cell
    //     cosine pairs -> clusters + canonical survivors; the oracle
    //     re-trains the identical centroids AND recomputes the closure --
    "sim_semdedup" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val corpus = e.union(
        e.select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.05)).as("embedding")))
      Similarity.semanticDedup(corpus, nCells = 16, threshold = 0.75)
        .orderBy(col("id"))
    },

    // --- chunk-granularity exact-substring dedup: corpus-wide first
    //     occurrence of each 16-token chunk survives, documents are
    //     reassembled from surviving chunks (twins vanish entirely) ------
    "text_chunk_dedup" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.dropDupChunks(corpus, "doc_id", "text", maxTokens = 16)
        .orderBy(col("id"))
    },

    // --- paragraph-level exact dedup: every doc carries a corpus-wide
    //     shared boilerplate block (survives once, in the min doc), its
    //     body text (dups in the +1e6 twin drop), and a unique tail
    //     (twin tails are unique too, so twins survive with 1 para) ----
    "text_para_dedup" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      def para3(idExpr: org.apache.spark.sql.Column) = concat_ws("\n",
        lit("shared boilerplate paragraph on every doc"),
        col("text"),
        concat(lit("unique tail "), idExpr)).as("text")
      val corpus = d.select(col("doc_id"), para3(col("doc_id")))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"),
          para3(col("doc_id") + 1000000)))
      Dedup.dropDupParagraphs(corpus, "doc_id", "text").orderBy(col("id"))
    },

    // --- per-source document cap (hash-ordered survivors, bounded-heap
    //     partial aggregate — never a window over the corpus) ------------
    "sample_source_cap" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.capPerGroup(d, col("doc_id"), col("source"), maxN = 15)
        .select(col("group").as("source"), col("id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"),
          min(col("id")).as("id_min"), max(col("id")).as("id_max"))
        .orderBy(col("source"))
    },

    // --- cluster-balanced semantic sampling: k-means cells (the IVF
    //     centroids, re-derived identically by the oracle) capped at 10
    //     docs each in stable hash order — dominant semantic modes stop
    //     crowding out the tail ------------------------------------------
    "sample_cluster_cap" -> { (s, dir) =>
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"),
          col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val cents = Similarity.trainCentroids(e, nCells = 16)
      Sampling.clusterBalancedSample(e, col("vec_id"), cents,
          maxPerCell = 10)
        .select(col("cell"), col("id").as("vec_id"))
        .orderBy(col("cell"), col("vec_id"))
    },

    // --- per-source TOKEN-budget cap (the pretraining-mix shape: take N
    //     tokens per source in deterministic hash order) — keyed
    //     distributed prefix sum, ONE range exchange, never a per-source
    //     single-reducer window ------------------------------------------
    "sample_token_cap" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Sampling.capPerGroupTokens(d, col("doc_id"), col("source"),
          col("n_chars"), budget = 5000L)
        .select(col("group").as("source"), col("id").as("doc_id"),
          col("n_tokens"), col("tok_offset"))
        .orderBy(col("source"), col("tok_offset"))
    },

    // --- Gopher rule battery: word-count / mean-length / alpha-word /
    //     stopword bounds -> keep verdict (scan-local projection) --------
    "text_gopher" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_words"),
          round(TextAnalysis.meanTokenLen(col("text")), 6).as("mean_word_len"),
          round(TextAnalysis.alphaWordRatio(col("text")), 6).as("alpha_word_ratio"),
          TextAnalysis.stopwordHits(col("text")).as("stop_hits"),
          TextAnalysis.gopherKeep(col("text")).as("keep"))
        .orderBy(col("doc_id"))
    },

    // --- BM25 lexical top-k (scan-local literal-term scoring; corpus
    //     stats reduce to one broadcast row) -----------------------------
    "text_bm25" -> { (s, dir) =>
      TextAnalysis.bm25TopK(Tables(s, dir).documents, "doc_id", "text",
          terms = bm25Terms, k = 20)
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy(col("id"))
    },

    // --- hashed unigram LM quality scoring (CCNet shape): train pass
    //     yields a bounded bucket table, apply pass scores each doc by
    //     exact integer quantized log-frequency sums ---------------------
    "text_lm_score" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val lm = TextAnalysis.unigramLmCounts(d, "text", nBuckets = 1024)
      TextAnalysis.lmScore(d, "doc_id", "text", lm, nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("logq_sum"), col("lm_score"))
        .orderBy(col("doc_id"))
    },

    // --- bigram Stupid-Backoff LM scoring (Brants et al. 2007): fluent
    //     text scores high on common word PAIRS; unseen bigrams back off
    //     to the w2 unigram with a fixed 2^-4 discount. All quantized
    //     integer logs, one double division per doc -----------------------
    "text_bigram_lm" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      // train on the English slice, score the WHOLE corpus: non-English
      // docs carry genuinely unseen bigrams, so the backoff branch is
      // exercised (self-training would make it vacuous)
      val train = d.filter(col("lang") === "en")
      val uni = TextAnalysis.unigramLmCounts(train, "text", nBuckets = 1024)
      val bi = TextAnalysis.bigramLmCounts(train, "text", nBuckets = 1024)
      TextAnalysis.bigramLmScore(d, "doc_id", "text", uni, bi,
          nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_bigrams"),
          col("logq_sum"), col("bo_score"))
        .orderBy(col("doc_id"))
    },

    // --- model-based quality classifier (DCLM/FineWeb-Edu shape): train
    //     a hashed-bag-of-words NB log-ratio model on lang='en' labels,
    //     round-trip it through the persisted-model lifecycle, score the
    //     corpus with exact integer weight sums ------------------------
    "text_quality_clf" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val model = TextAnalysis.trainQualityClassifier(
        d, "text", col("lang") === "en", nBuckets = 1024)
      val mdir = scratchDir("qclf", dir)
      TextAnalysis.QualityModel.save(model, mdir)
      val loaded = TextAnalysis.QualityModel.load(s, mdir)
      TextAnalysis.scoreQualityClassifier(d, "doc_id", "text", loaded,
          nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_tokens"), col("clf_sum"),
          col("clf_mean"))
        .orderBy(col("doc_id"))
    },

    // --- DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    //     importance weights of raw docs vs an English target slice,
    //     deterministic top-100 pick by normalized weight. Uses the
    //     fused in-corpus counting pass (2 feature scans, not 3) --------
    "text_dsir_select" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      TextAnalysis.dsirWeightsWithin(d, "doc_id", "text",
          targetCond = col("lang") === "en", nBuckets = 1024)
        .orderBy(col("dsir_mean").desc, col("id")).limit(100)
        .select(col("id").as("doc_id"), col("n_feats"), col("dsir_sum"),
          col("dsir_mean"))
        .orderBy(col("doc_id"))
    },

    // --- standing streaming retention, replayed under oracle: cohort
    //     flags accumulate across 3 time-ordered batches; each batch's
    //     emitted row is the anchor-gated retention over full history --
    "stream_retention_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val w1 = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
      val w2 = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
      val stateDir = scratchDir("stream_retention", dir)
      val sr = new graft.streaming.StreamingRetention(s, stateDir,
        "user_id", Seq(
          "anchor" -> (col("event_type") === "signup" && col("ts") < w1),
          "week2" -> (col("ts") >= w1 && col("ts") < w2),
          "week3" -> (col("ts") >= w2)))
      sr.seed(e.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = sr.admit(batchDf(b), b.toLong).withColumn("batch", lit(b))
        if (b == 0) sr.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("user_id"), col("r0"), col("r1"),
          col("r2"))
        .orderBy(col("batch"), col("user_id"))
    },

    // --- standing streaming funnel, replayed under oracle: events
    //     arrive in three event-time-ordered batches; each batch's
    //     emitted level must equal the BATCH windowFunnel over the
    //     user's full history so far (chains spanning batch boundaries
    //     within the 4h window must surface) ----------------------------
    "stream_funnel_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val stateDir = scratchDir("stream_funnel", dir)
      val swf = new graft.streaming.StreamingWindowFunnel(s, stateDir,
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"), windowSec = 14400)
      swf.seed(e.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = swf.admit(batchDf(b), b.toLong).withColumn("batch", lit(b))
        if (b == 0) swf.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("user_id"), col("level"))
        .orderBy(col("batch"), col("user_id"))
    },

    // --- standing streaming SummingMerge (the CH materialized-view
    //     pattern), replayed under oracle: a rollup over lineitem folds
    //     one batch at a time; every batch's emitted row must equal the
    //     batch aggregate over the key's full history — addition is not
    //     idempotent, so this pins the newest-state-row read discipline -
    "stream_summing_replay" -> { (s, dir) =>
      val l = Tables(s, dir).lineitem.select(
        (col("l_partkey") % 500).as("k"),
        (col("l_orderkey") % 3).as("b"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val stateDir = scratchDir("stream_summing", dir)
      val sm = new graft.streaming.StreamingSummingMerge(s, stateDir,
        "k", Seq("qty", "price"))
      sm.seed(l.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = sm.admit(l.filter(col("b") === b).drop("b"), b.toLong)
          .withColumn("batch", lit(b))
        if (b == 0) sm.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      // compare surface rounded through DOUBLE on both sides (driver's
      // hasher rejects DECIMAL renderings; state stays exact DECIMAL)
      outs.select(col("batch"), col("k"),
          round(col("qty").cast("double"), 6).as("qty"),
          round(col("price").cast("double"), 6).as("price"))
        .orderBy(col("batch"), col("k"))
    },

    // --- standing streaming VersionedCollapsing (the fourth MergeTree
    //     streaming tier), replayed under oracle: signed rows fold into
    //     per-(key, VERSION) nets across 3 batches — pairwise cancels
    //     collapse, a SECOND cancel drives the net negative (the
    //     tombstone row must survive net 0 for that to fold right), and
    //     old-version cancels never consume newer state ----------------
    "stream_versioned_replay" -> { (s, dir) =>
      val base = Tables(s, dir).orders.filter(col("o_orderkey") < 3000)
        .select((col("o_orderkey") % 149).as("k"),
          expr("CAST(o_orderkey DIV 149 AS BIGINT)").as("ver"),
          (col("o_orderkey") % 3).as("g"), col("o_totalprice").as("tp"))
      def states(g: Int) = base.filter(col("g") === g)
        .select(col("k"), lit(1).as("sign"), col("ver"), col("tp"))
      def cancels(g: Int, m: Int) = base
        .filter(col("g") === g && col("ver") % m === 0)
        .select(col("k"), lit(-1).as("sign"), col("ver"), col("tp"))
      val batches = Seq(
        states(0),
        states(1).unionByName(cancels(0, 2)),
        states(2).unionByName(cancels(1, 2))
          .unionByName(cancels(0, 10))) // second cancel -> net -1
      val stateDir = scratchDir("stream_versioned", dir)
      val svc = new graft.streaming.StreamingVersionedCollapsing(s,
        stateDir, "k", "sign", "ver", Seq("tp"))
      svc.seed(states(0).filter(lit(false)))
      val outs = batches.zipWithIndex.map { case (b, i) =>
        val r = svc.admit(b, i.toLong).withColumn("batch", lit(i))
        if (i == 0) svc.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("k"), col("ver"), col("net"),
          col("surviving"), round(col("tp"), 6).as("totalprice"))
        .orderBy(col("batch"), col("k"), col("ver"))
    },

    // --- standing streaming quantile sketch, replayed under oracle:
    //     per-batch histogram folds; each batch's p50/p90 must equal the
    //     batch sketch over the key's full history ----------------------
    "stream_quantile_replay" -> { (s, dir) =>
      val l = Tables(s, dir).lineitem.select(
        col("l_returnflag").as("flag"),
        (col("l_orderkey") % 3).as("b"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val stateDir = scratchDir("stream_quantile", dir)
      val sq = new graft.streaming.StreamingQuantile(s, stateDir,
        "flag", "price", Seq(("p50", 1, 2), ("p90", 9, 10)))
      sq.seed(l.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = sq.admit(l.filter(col("b") === b).drop("b"), b.toLong)
          .withColumn("batch", lit(b))
        if (b == 0) sq.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("flag"), col("n"),
          col("p50"), col("p90"))
        .orderBy(col("batch"), col("flag"))
    },

    // --- standing streaming uniqHLL, replayed under oracle: the
    //     persisted state IS the register sketch and the admission fold
    //     IS the HLL merge (register-wise max), so each batch's emitted
    //     estimate must equal the BATCH uniqHll over the full history —
    //     the -State/-Merge combinator contract, checked exactly -------
    "stream_uniq_hll_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val stateDir = scratchDir("stream_uniqhll", dir)
      val su = new graft.streaming.StreamingUniqHll(s, stateDir,
        "event_type", "user_id")
      su.seed(e.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = su.admit(batchDf(b), b.toLong).withColumn("batch", lit(b))
        if (b == 0) su.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("event_type"), col("est"), col("n_regs"))
        .orderBy(col("batch"), col("event_type"))
    },

    // --- standing streaming KMV distinct, replayed under oracle: the
    //     persisted state is the per-key min-k distinct hash set and the
    //     admission fold is the KMV merge (idempotent min-k), so each
    //     batch's emitted estimate must equal the BATCH uniqKmv over the
    //     key's full history -------------------------------------------
    "stream_kmv_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val stateDir = scratchDir("stream_kmv", dir)
      val su = new graft.streaming.StreamingUniqKmv(s, stateDir,
        "event_type", "event_id", k = 256)
      su.seed(e.filter(lit(false)))
      val outs = (0 until 3).map { b =>
        val r = su.admit(batchDf(b), b.toLong).withColumn("batch", lit(b))
        if (b == 0) su.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("event_type"), col("est"), col("n_kept"))
        .orderBy(col("batch"), col("event_type"))
    },

    // --- streaming ANALYTICS capstone: funnel + retention standing
    //     state driven through the SAME 3-batch event timeline under ONE
    //     replay, with a COLD RESTART between batches 0 and 1 — both
    //     operator instances are discarded and rebuilt from their disk
    //     state (the SinkerApp restart contract: params re-validated,
    //     batch-id monotonicity enforced, state read back from
    //     snapshot+delta dirs). Per batch the two tiers' touched-user
    //     outputs full-outer join on user — proving the r10 analytics
    //     tiers compose under one timeline and survive process death ----
    "stream_analytics_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val w1 = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
      val w2 = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
      val funnelDir = scratchDir("stream_cap_funnel", dir)
      val retDir = scratchDir("stream_cap_ret", dir)
      def mkFunnel() = new graft.streaming.StreamingWindowFunnel(s, funnelDir,
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"), windowSec = 14400)
      def mkRetention() = new graft.streaming.StreamingRetention(s, retDir,
        "user_id", Seq(
          "anchor" -> (col("event_type") === "signup" && col("ts") < w1),
          "week2" -> (col("ts") >= w1 && col("ts") < w2),
          "week3" -> (col("ts") >= w2)))
      val f0 = mkFunnel(); val r0 = mkRetention()
      f0.seed(e.filter(lit(false))); r0.seed(e.filter(lit(false)))
      def runBatch(f: graft.streaming.StreamingWindowFunnel,
          r: graft.streaming.StreamingRetention, b: Int) = {
        val fl = f.admit(batchDf(b), b.toLong)
        val rt = r.admit(batchDf(b), b.toLong)
        fl.join(rt, Seq("user_id"), "full_outer")
          .withColumn("batch", lit(b))
      }
      val out0 = runBatch(f0, r0, 0)
      // force the admits before discarding the instances: the restart
      // must read batch 0's state from DISK, not from these objects
      out0.cache().count()
      f0.compact(upTo = 0L)
      val f1 = mkFunnel(); val r1 = mkRetention() // <- the restart
      val outs = out0 +: (1 until 3).map(b => runBatch(f1, r1, b))
      outs.reduce(_ unionByName _)
        .select(col("batch"), col("user_id"), col("level"),
          col("r0"), col("r1"), col("r2"))
        .orderBy(col("batch"), col("user_id"))
    },

    // --- FIVE standing tiers under ONE state root (funnel, retention,
    //     uniqHLL, quantile sketch, SummingMerge), fed the same event
    //     batches, with a COLD RESTART after batch 0 (all five instances
    //     discarded and rebuilt from disk) and a compaction — proves the
    //     per-tier BatchedState dirs coexist under one root, batch-id
    //     monotonicity holds across instances, and every tier's emitted
    //     view equals its full-history replay. Output is one tall frame
    //     (batch, tier, k, v1, v2) so five shapes share one oracle ----
    "stream_multitier_replay" -> { (s, dir) =>
      val e = Tables(s, dir).events
      def ntz(x: String) = lit(x).cast("timestamp_ntz")
      def batchDf(b: Int) = b match {
        case 0 => e.filter(col("ts") < ntz("2024-01-11 00:00:00"))
        case 1 => e.filter(col("ts") >= ntz("2024-01-11 00:00:00") &&
          col("ts") < ntz("2024-01-21 00:00:00"))
        case _ => e.filter(col("ts") >= ntz("2024-01-21 00:00:00"))
      }
      val w1 = ntz("2024-01-08 00:00:00"); val w2 = ntz("2024-01-15 00:00:00")
      val root = scratchDir("stream_multitier", dir)
      def quantIn(df: DataFrame) = df.select(col("event_type"),
        col("value").cast("decimal(18,2)").as("v"))
      def sumIn(df: DataFrame) = df.select(
        (col("user_id") % 10).cast("string").as("k"),
        col("value").cast("decimal(18,2)").as("v"))
      def mkTiers() = (
        // nBuckets=8: the capstone's keyspaces are tiny (<=150 users /
        // 5 event types / 10 sum keys), so the default 64 state buckets
        // only multiply file churn across 5 tiers x 3 batches; bucket
        // count is a pruning knob, never a semantics one
        new graft.streaming.StreamingWindowFunnel(s, s"$root/funnel",
          "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSec = 14400,
          nBuckets = 8),
        new graft.streaming.StreamingRetention(s, s"$root/ret", "user_id",
          Seq("anchor" -> (col("event_type") === "signup" && col("ts") < w1),
            "week2" -> (col("ts") >= w1 && col("ts") < w2),
            "week3" -> (col("ts") >= w2)), nBuckets = 8),
        new graft.streaming.StreamingUniqHll(s, s"$root/hll",
          "event_type", "user_id", nBuckets = 8),
        new graft.streaming.StreamingQuantile(s, s"$root/quant",
          "event_type", "v", Seq(("p50", 1, 2), ("p90", 9, 10)),
          nBuckets = 8),
        new graft.streaming.StreamingSummingMerge(s, s"$root/sum",
          "k", Seq("v"), nBuckets = 8))
      // opt-in per-tier decomposition ([[replayPhase]]): each tier's
      // admit() is EAGER (localCheckpoint inside), so per-call wall
      // attributes cleanly — the stream_dedup_replay hook extended to
      // the five-tier capstone
      def phase[A](label: String)(f: => A): A =
        replayPhase("multitier", label)(f)
      val t0 = mkTiers()
      val empty = e.filter(lit(false))
      phase("seed") {
        t0._1.seed(empty); t0._2.seed(empty); t0._3.seed(empty)
        t0._4.seed(quantIn(empty)); t0._5.seed(sumIn(empty))
      }
      val dNull = lit(null).cast("double")
      def runBatch(t: (graft.streaming.StreamingWindowFunnel,
          graft.streaming.StreamingRetention,
          graft.streaming.StreamingUniqHll,
          graft.streaming.StreamingQuantile,
          graft.streaming.StreamingSummingMerge), b: Int) = {
        // the shared batch frame is pinned only UNDER TIMING (clean
        // per-tier attribution needs it materialized once); the default
        // path keeps the lazy filter-over-parquet — recomputing a scan
        // five times is cheaper than holding 3 batches in block storage
        // and losing lineage recovery
        val bd = if (!replayTiming) batchDf(b)
          else phase(s"batchdf$b")(batchDf(b).localCheckpoint())
        Seq(
          phase(s"funnel$b")(t._1.admit(bd, b.toLong))
            .select(lit("funnel").as("tier"),
            col("user_id").cast("string").as("k"),
            col("level").cast("double").as("v1"), dNull.as("v2")),
          phase(s"retention$b")(t._2.admit(bd, b.toLong))
            .select(lit("retention").as("tier"),
            col("user_id").cast("string").as("k"),
            (col("r0") * 4 + col("r1") * 2 + col("r2"))
              .cast("double").as("v1"), dNull.as("v2")),
          phase(s"uniq$b")(t._3.admit(bd, b.toLong))
            .select(lit("uniq").as("tier"),
            col("event_type").as("k"), col("est").cast("double").as("v1"),
            col("n_regs").cast("double").as("v2")),
          phase(s"quantile$b")(t._4.admit(quantIn(bd), b.toLong))
            .select(lit("quantile").as("tier"),
            col("event_type").as("k"), col("p50").as("v1"),
            col("p90").as("v2")),
          phase(s"summing$b")(t._5.admit(sumIn(bd), b.toLong))
            .select(lit("summing").as("tier"),
            col("k"), round(col("v").cast("double"), 6).as("v1"),
            dNull.as("v2"))
        ).reduce(_ unionByName _).withColumn("batch", lit(b))
      }
      val out0 = runBatch(t0, 0)
      phase("force0")(out0.cache().count()) // force before instance discard
      phase("compact") {
        t0._1.compact(upTo = 0L); t0._3.compact(upTo = 0L)
        t0._4.compact(upTo = 0L); t0._5.compact(upTo = 0L)
      }
      val t1 = mkTiers() // <- the cold restart: state re-read from disk
      val outs = out0 +: (1 until 3).map(b => runBatch(t1, b))
      outs.reduce(_ unionByName _)
        .select(col("batch"), col("tier"), col("k"), col("v1"), col("v2"))
        .orderBy(col("batch"), col("tier"), col("k"))
    },

    // --- standing CDC view, replayed under oracle: seed a keyed
    //     current-state view from orders, then 3 update batches — batch 2
    //     is entirely STALE (versions below the standing ones), so its
    //     rows must report changed=false with the prior state intact ----
    "stream_replacing_replay" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      val seedRows = o.select((col("o_orderkey") % 300).as("k"),
        col("o_orderkey").as("ver"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("tp"))
      val keys = seedRows.select(col("k")).distinct()
      def batchDf(b: Int) = {
        val m = Seq(3, 4, 5)(b)
        val verBase = Seq(1000000L, 2000000L, 1000L)(b)
        keys.filter(col("k") % m === 0)
          .select(col("k"), (col("k") + lit(verBase)).as("ver"),
            lit(s"U$b").as("status"),
            (col("k").cast("double") * (b + 1.5)).as("tp"))
      }
      val stateDir = scratchDir("stream_cdc", dir)
      val srm = new graft.streaming.StreamingReplacingMerge(s, stateDir,
        "k", "ver", Seq("status", "tp"))
      srm.seed(seedRows)
      val outs = (0 until 3).map { b =>
        val r = srm.admit(batchDf(b), b.toLong).withColumn("batch", lit(b))
        // fold seed + batch 0 mid-replay: batches 1-2 must see identical
        // state through the file compaction
        if (b == 0) srm.compact(upTo = 0L)
        r
      }.reduce(_ unionByName _)
      outs.select(col("batch"), col("k"), col("ver"), col("status"),
          round(col("tp"), 6).as("totalprice"), col("prev_ver"),
          col("changed"))
        .orderBy(col("batch"), col("k"))
    },

    // --- ReplacingMergeTree FINAL: greatest-version row per key (the
    //     CDC upsert fold of appended rows) ------------------------------
    "q_replacing_merge" -> { (s, dir) =>
      val o = Tables(s, dir).orders.select(
        (col("o_orderkey") % 1000).as("k"), col("o_orderkey").as("ver"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("totalprice"))
      graft.operators.MergeSemantics.replacingMerge(o, Seq("k"), "ver")
        .withColumn("totalprice", round(col("totalprice"), 6))
        .orderBy(col("k"))
    },

    // --- SummingMergeTree FINAL: exact decimal sums per key. The fold
    //     itself stays exact DECIMAL; the COMPARE SURFACE is rounded
    //     through DOUBLE on both sides because the driver's hasher
    //     disagrees on decimal value renderings even when DuckDB-visible
    //     types and values match (r10/r11 lesson — same as q_tpch_q3) --
    "q_summing_merge" -> { (s, dir) =>
      val l = Tables(s, dir).lineitem.select(
        (col("l_partkey") % 500).as("k"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      graft.operators.MergeSemantics.summingMerge(l, Seq("k"),
          Seq("qty", "price"))
        .select(col("k"),
          round(col("qty").cast("double"), 6).as("qty"),
          round(col("price").cast("double"), 6).as("price"))
        .orderBy(col("k"))
    },

    // --- CollapsingMergeTree FINAL: +1/-1 sign fold, net>0 keys keep
    //     their greatest-version state row -------------------------------
    "q_collapsing_merge" -> { (s, dir) =>
      val o = Tables(s, dir).orders.select(
        (col("o_orderkey") % 97).as("k"),
        when(col("o_orderkey") % 2 === 0, 1).otherwise(-1).as("sign"),
        col("o_orderkey").as("ver"), col("o_totalprice").as("tp"))
      graft.operators.MergeSemantics.collapsingMerge(o, Seq("k"), "sign", "ver")
        .select(col("k"), col("ver"), round(col("tp"), 6).as("totalprice"))
        .orderBy(col("k"))
    },

    // --- VersionedCollapsingMergeTree FINAL: cancels pair on (key,
    //     version) — even-version states are cancelled pairwise, odd
    //     versions survive untouched, stray cancels (no matching state)
    //     surface with sign -1 instead of consuming a newer version ----
    "q_versioned_collapsing" -> { (s, dir) =>
      val base = Tables(s, dir).orders.select(
        (col("o_orderkey") % 149).as("k"),
        expr("CAST(o_orderkey DIV 149 AS BIGINT)").as("ver"),
        col("o_totalprice").as("tp"))
      val states = base.withColumn("sign", lit(1))
      val cancels = base.filter(col("ver") % 2 === 0)
        .withColumn("sign", lit(-1))
      val strays = base.filter(col("ver") % 7 === 3)
        .withColumn("ver", col("ver") + 1000000L)
        .withColumn("sign", lit(-1))
      val rows = states.unionByName(cancels).unionByName(strays)
        .select(col("k"), col("sign"), col("ver"), col("tp"))
      graft.operators.MergeSemantics
        .versionedCollapsingMerge(rows, Seq("k"), "sign", "ver")
        .select(col("k"), col("ver"), col("sign"),
          round(col("tp"), 6).as("totalprice"))
        .orderBy(col("k"), col("ver"))
    },

    // --- asymmetric containment dedup: 10-word excerpts of each doc are
    //     planted — containment flags sub-document duplication Jaccard
    //     dilutes (excerpt-in-doc ~1.0 vs Jaccard ~0.1) -----------------
    "dedup_ngram_containment" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 100)
      val subs = d.select((col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 10)).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).union(subs)
      Dedup.containmentPairs(corpus, "doc_id", "text", n = 3,
          threshold = 0.6)
        .select(col("a"), col("b"),
          round(col("containment"), 6).as("containment"))
        .orderBy(col("a"), col("b"))
    },

    // --- Luhn card detection: planted valid + invalid digit runs; only
    //     checksum-valid candidates flag (precision over scrub-all) -----
    "text_pii_cards" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 200)
      val corpus = d.select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit(" card 4539578763621486 ref 1234567890123"))
            .otherwise(lit(" acct 79927398713999 ord 4111111111111111")))
          .as("text"))
      corpus.select(col("doc_id"),
          explode(TextAnalysis.cardCandidates(col("text"))).as("candidate"))
        .withColumn("valid", TextAnalysis.luhnValid(col("candidate")))
        .orderBy(col("doc_id"), col("candidate"))
    },

    // --- ARI readability (Senter & Smith 1967): the syllable-free
    //     readability heuristic as a pure scan-local projection ---------
    "text_readability" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      d.select(col("doc_id"),
          // cast: Spark length() is INT, DuckDB's is BIGINT — align widths
          length(regexp_replace(col("text"), "\\s+", "")).cast("long")
            .as("n_chars_ns"),
          TextAnalysis.wsTokenCount(col("text")).as("n_words"),
          greatest(size(split(col("text"), "[.!?]+")) - 1, lit(1))
            .cast("long").as("n_sentences"),
          // quantized micro-units: engine round() implementations can
          // disagree by one ulp at a .5 boundary; floor(x*1e6+0.5) is the
          // same IEEE ops on both sides, hence exact
          floor(TextAnalysis.ariScore(col("text")) * 1000000 + 0.5)
            .cast("long").as("ari_q"))
        .orderBy(col("doc_id"))
    },

    // --- fixed-bin histogram (deterministic CH histogram() stand-in):
    //     integer-div banding reuses the TimeSeries bucket discipline --
    "q_histogram" -> { (s, dir) =>
      val e = Tables(s, dir).events
      e.select((floor(col("value") / 20.0)).cast("long").as("bin"),
          col("value"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 6).as("lo"),
          round(max(col("value")), 6).as("hi"))
        .orderBy(col("bin"))
    },

    // --- weighted Bernoulli sampling: keep probability = per-doc length
    //     weight, decided by the stable md5 bucket (never rand()) -------
    "sample_weighted" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val w = least(col("n_chars").cast("double") / 2000.0, lit(1.0))
      Sampling.sampleByWeight(d, col("doc_id"), w)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // --- hard-negative mining: per query, top-5 corpus vectors inside
    //     the [0.3, 0.9) cosine band (similar-but-not-duplicate) --------
    "sim_hard_negatives" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"),
          col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.hardNegativesTopK(e, e.filter(col("vec_id") < 20), k = 5,
          loCos = 0.3, hiCos = 0.9)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- leakage-safe split: exact-dup families (doc + planted twin)
    //     must land whole in one split — the key is the dedup cluster --
    "sample_split_safe" -> { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val corpus = d.union(d.select((col("doc_id") + 1000000).as("doc_id"),
        col("text")))
      val withFp = corpus.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val pairs = withFp.alias("x").join(withFp.alias("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      Sampling.leakageSafeSplit(corpus.select(col("doc_id")), "doc_id",
          pairs, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy(col("doc_id"))
    },

    // --- time-series resample + WITH FILL + LOCF + runningDifference +
    //     exact moving average over 6h buckets of the events stream ------
    "q_timeseries_fill" -> { (s, dir) =>
      import graft.operators.TimeSeries
      val e = Tables(s, dir).events
        .filter(col("event_type") === "purchase") // sparse series: real gaps
        .select((col("user_id") % 10).as("k"), col("ts"), col("value"))
      val rs = TimeSeries.resample(e, Seq("k"), "ts", stepSec = 21600,
        valueCol = col("value").cast("decimal(18,2)"))
      val filled = TimeSeries.locf(rs, Seq("k"), "b", "v0")
      val withDelta = TimeSeries.runningDelta(filled, Seq("k"), "b", "v0")
      TimeSeries.movingAvg(withDelta, Seq("k"), "b", "v0", nBuckets = 4)
        // compare surface rounded through DOUBLE on both sides: the
        // driver's hasher rejects DECIMAL renderings even when values and
        // DuckDB-visible types match (r11 lesson; mov_avg already double)
        .select(col("k"), col("b"),
          round(col("v0").cast("double"), 6).as("v"), col("n"),
          col("filled"),
          round(col("delta").cast("double"), 6).as("delta"), col("mov_avg"))
        .orderBy(col("k"), col("b"))
    },

    // --- WITH FILL ... INTERPOLATE: the same sparse resampled series,
    //     gap buckets linearly interpolated between their surrounding
    //     observations (vs locf's step carry) ---------------------------
    "q_timeseries_interp" -> { (s, dir) =>
      import graft.operators.TimeSeries
      val e = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 10).as("k"), col("ts"), col("value"))
      val rs = TimeSeries.resample(e, Seq("k"), "ts", stepSec = 21600,
        valueCol = col("value").cast("decimal(18,2)"))
      TimeSeries.interpolate(rs, Seq("k"), "b", "v0")
        .select(col("k"), col("b"), col("filled"),
          round(col("interp"), 6).as("v"))
        .orderBy(col("k"), col("b"))
    },

    // --- ClickHouse windowFunnel: deepest view->click->purchase chain
    //     within 4h of the chain start, exists-chain semantics ----------
    "q_window_funnel" -> { (s, dir) =>
      graft.operators.EventAnalytics.windowFunnel(Tables(s, dir).events,
          "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSec = 14400)
        .orderBy(col("user_id"))
    },

    // --- windowFunnel('strict_increase'): same funnel, chain timestamps
    //     strictly increasing (CH mode parity; the interrupt modes
    //     strict_order / strict_dedup are positional and unit-pinned) --
    "q_window_funnel_strict" -> { (s, dir) =>
      graft.operators.EventAnalytics.windowFunnel(Tables(s, dir).events,
          "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSec = 14400,
          mode = "strict_increase")
        .orderBy(col("user_id"))
    },

    // --- windowFunnel('strict_dedup'): a repeat of an already-matched
    //     step interrupts the chain. The greedy per-start walk is
    //     positional, so the oracle replays it LITERALLY — a recursive
    //     CTE advancing one sorted event at a time per chain start.
    //     Every 'view' is re-planted +60s (a repeated step-0 event) so
    //     the dedup cut genuinely fires: chains whose click lands >60s
    //     after the view are interrupted here but not in default mode --
    "q_window_funnel_strict_dedup" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val planted = e.filter(col("event_type") === "view")
        .withColumn("ts", col("ts") + expr("INTERVAL 60 SECONDS"))
      graft.operators.EventAnalytics.windowFunnel(e.unionByName(planted),
          "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSec = 14400,
          mode = "strict_dedup")
        .orderBy(col("user_id"))
    },

    // --- windowFunnel('strict_order'): ANY other step event between
    //     expected steps interrupts; same literal walk replay ----------
    "q_window_funnel_strict_order" -> { (s, dir) =>
      graft.operators.EventAnalytics.windowFunnel(Tables(s, dir).events,
          "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSec = 14400,
          mode = "strict_order")
        .orderBy(col("user_id"))
    },

    // --- ClickHouse sequenceMatch('(?1).*(?2).*(?3)'): ordered chain
    //     with NO time bound — the funnel walk with an effectively
    //     unbounded window (10y >> the 2-day slice — only 10 of 142
    //     users complete the ordered triple that early) ----------------
    "q_sequence_match" -> { (s, dir) =>
      val e = Tables(s, dir).events
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
      graft.operators.EventAnalytics.windowFunnel(e,
          "user_id", "ts", "event_type",
          steps = Seq("signup", "view", "purchase"),
          windowSec = 315360000L)
        .select(col("user_id"), (col("level") === 3).as("matched"))
        .orderBy(col("user_id"))
    },

    // --- ClickHouse sequenceCount('(?1).*(?2).*(?3)'): non-overlapping
    //     ordered triples, greedy automaton (oracle replays the same
    //     fold as a linear recursive CTE) ------------------------------
    "q_sequence_count" -> { (s, dir) =>
      graft.operators.EventAnalytics.sequenceCount(Tables(s, dir).events,
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    },

    // --- ClickHouse retention: week-1 signup anchor, week-2/3 activity -
    "q_retention" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val w1 = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
      val w2 = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
      graft.operators.EventAnalytics.retention(e, "user_id", Seq(
          col("event_type") === "signup" && col("ts") < w1,
          col("ts") >= w1 && col("ts") < w2,
          col("ts") >= w2))
        .orderBy(col("user_id"))
    },

    // --- integer PageRank over a lineitem-derived link graph (5 exact
    //     scaled-integer iterations; oracle unrolls the same rounds) ----
    "graph_pagerank" -> { (s, dir) =>
      val l = Tables(s, dir).lineitem
      val edges = l.select((col("l_orderkey") % 500).as("src"),
        (col("l_partkey") % 500).as("dst"))
      graft.operators.Graph.pageRank(edges, iterations = 5)
        .orderBy(col("node"))
    },

    // --- hybrid retrieval: RRF fusion of the BM25 lexical pool and the
    //     dense cosine pool around doc 7's embedding --------------------
    "text_hybrid_rrf" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.operators.Retrieval.hybridTopK(t.documents, "doc_id", "text",
          terms = bm25Terms, embeddings = t.embeddings, queryVecId = 7L,
          k = 20, poolK = 50)
        .select(col("id").as("doc_id"), col("lex_rank"), col("dense_rank"),
          col("rrf"), col("rank"))
        .orderBy(col("doc_id"))
    },

    // --- BPE pair statistics: top adjacent character pairs within
    //     canonical tokens (one merge step of tokenizer training) --------
    "text_bpe_pairs" -> { (s, dir) =>
      TextAnalysis.bpePairStats(Tables(s, dir).documents, "text")
        .orderBy(col("cnt").desc, col("pair"))
        .limit(50)
    },

    // --- Gopher duplicate/top n-gram signals (the §A1.1 repetition
    //     battery beyond the distinct-word ratio) -------------------------
    "text_rep_ngrams" -> { (s, dir) =>
      TextAnalysis.repetitionNgramStats(
          Tables(s, dir).documents, "doc_id", "text", topN = 2, dupN = 5)
        .orderBy(col("doc_id"))
    },

    // --- BPE trainer: 3 driver-picked merge rounds over the corpus
    //     vocab; output is the merge table --------------------------------
    "text_bpe_train" -> { (s, dir) =>
      TextAnalysis.bpeTrain(Tables(s, dir).documents, "text", nMerges = 3)
    },

    // --- deep BPE trainer: 64 merges via BATCHED selection (8 rounds x
    //     up to 8 greedy-disjoint picks per recount) — proves the
    //     driver loop at real depth: merge count scales with nMerges/batch
    //     rounds, not nMerges ------------------------------------------
    "text_bpe_train_deep" -> { (s, dir) =>
      TextAnalysis.bpeTrain(Tables(s, dir).documents, "text",
        nMerges = 64, batch = 8)
    },

    // --- BPE apply: encode the corpus with the 3 trained merges; the
    //     merge table is a bounded driver-side collect (nMerges rows) ----
    "text_bpe_encode" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val merges = TextAnalysis.bpeTrain(d, "text", nMerges = 3)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeApply(d, "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    },

    // --- boilerplate line removal: planted repeated lines (newsletter on
    //     every even doc, cookie banner on every fifth) vanish; per-doc
    //     unique lines survive in original order -------------------------
    "text_boilerplate" -> { (s, dir) =>
      val corpus = Tables(s, dir).documents.select(col("doc_id"),
        concat_ws("\n", col("text"),
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter today"))
            .otherwise(concat(lit("footer note "), col("doc_id"))),
          when(col("doc_id") % 5 === 0, lit("cookie policy accept all"))
            .otherwise(concat(lit("unique line "), col("doc_id")))).as("text"))
      TextAnalysis.stripBoilerplateLines(corpus, "doc_id", "text", minDocs = 50)
        .orderBy(col("id"))
    },

    // --- URL/domain provenance rollup (URLs planted deterministically:
    //     every third doc cites one of 7 sites, every 12th a second) ----
    "text_domains" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" see https://site"), col("doc_id") % 7,
            lit(".example.org/p/"), col("doc_id"),
            when(col("doc_id") % 12 === 0,
              concat(lit(" and http://mirror.example.net/x"), col("doc_id")))
              .otherwise(lit(""))).as("text"))
      TextAnalysis.domainStats(corpus, "doc_id", "text")
        .orderBy(col("domain"))
    },

    // --- Unicode NFC normalization: decomposed accents + Hangul jamo
    //     planted; oracle is DuckDB's utf8proc nfc_normalize ------------
    "text_nfc" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.filter(col("doc_id") < 500).select(col("doc_id"),
        concat(col("text"),
          lit(" cafe\u0301 \u1100\u1161")).as("text"))
      corpus.select(col("doc_id"),
          TextAnalysis.nfc(col("text")).as("nfc_text"),
          (TextAnalysis.nfc(col("text")) =!= col("text")).as("changed"))
        .orderBy(col("doc_id"))
    },

    // --- C4 heuristic cleaning battery: lines planted so each rule has
    //     survivors and victims (short / no-punct / javascript lines;
    //     lorem-ipsum and curly-brace pages) ------------------------------
    "text_c4_filters" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.filter(col("doc_id") < 500).select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          lit("too short."),                                  // < 5 words
          lit("this line has plenty of words but no terminal mark"),
          concat(lit("please enable javascript to view item "),
            col("doc_id"), lit(".")),                         // js line
          concat(lit("a perfectly fine closing sentence about document "),
            col("doc_id"), lit("."))).as("text"))
        .withColumn("text",
          when(col("doc_id") % 17 === 0,
            concat(col("text"), lit("\nlorem ipsum dolor sit amet.")))
          .when(col("doc_id") % 23 === 0,
            concat(col("text"), lit("\nif (x) { return; }")))
          .otherwise(col("text")))
      TextAnalysis.c4Signals(corpus, "doc_id", "text").orderBy(col("id"))
    },

    // --- URL normalization + URL-keyed dedup: four noisy variants of
    //     each planted URL (case, www, default port, tracking params,
    //     fragment, trailing slash) must collapse to one key -------------
    "text_url_dedup" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val g = (col("doc_id") / lit(4)).cast("long")
      val site = concat(lit("site"), g % 7, lit(".example.org"))
      val path = concat(lit("/p/"), g)
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://"), upper(site), lit(":443"), path,
            lit("?utm_source=feed&b=2&a=1#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("https://"), site, path, lit("?a=1&b=2")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www."), site, path, lit("/?b=2&a=1&gclid=z")))
        .otherwise(
          concat(lit("https://"), site, path, lit("?b=2&utm_medium=mail&a=1")))
      TextAnalysis.urlDedupGroups(
        d.filter(col("doc_id") < 1000).select(col("doc_id"), url.as("url")),
        "doc_id", "url")
        .orderBy(col("url_norm"))
    },

    // --- multimodal frame sampling: contiguous byte windows at the
    //     demuxer-stub seek offsets, exact per-frame byte sums -----------
    "mm_frames" -> { (s, dir) =>
      val assets = Multimodal.syntheticAssets(
        Tables(s, dir).documents.select(col("doc_id").as("asset_id")),
        modality = "video")
      Multimodal.sampleFrames(assets, nFrames = 4).toDF()
        .orderBy(col("asset_id"), col("frame_id"))
    },

    // --- multimodal resize stub: strided-byte thumbnail geometry +
    //     exact sampled-byte sums ----------------------------------------
    "mm_resize" -> { (s, dir) =>
      val assets = Multimodal.syntheticAssets(
        Tables(s, dir).documents.select(col("doc_id").as("asset_id")),
        modality = "image")
      Multimodal.resizeStub(assets, maxBytes = 64).toDF()
        .orderBy(col("asset_id"))
    }
  )

  /** The fixed query bag for the BM25 entry (all present in the synthetic
    * vocabulary with distinct document frequencies).
    */
  private val bm25Terms = Seq("spark", "join", "window", "vector")

  // ==== oracle SQL ======================================================

  /** The planted-twin corpus used by the dedup oracles. */
  private val corpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents)""".stripMargin

  /** Canonical distinct word-3-gram shingles (mirrors WordShingles). */
  private def shinglesCtes(src: String): String =
    s"""w AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ') AS words
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(words) < 3
       |      THEN [array_to_string(words, ' ')]
       |      ELSE list_transform(range(1, len(words) - 1),
       |             i -> array_to_string(words[i:i+2], ' ')) END) AS s
       |  FROM w)""".stripMargin

  private val jaccardExpr =
    "CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / " +
      "len(list_distinct(list_concat(sa.s, sb.s)))"

  /** Signed-long value of `h1 + i*h2` with 64-bit wrap, in HUGEINT —
    * bit-parity with Spark's wrapped long arithmetic.
    */
  private def wrappedPerm(i: Int): String = {
    val u = s"((h1 + $i*h2) % 18446744073709551616)"
    s"($u - CASE WHEN $u >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
  }

  /** Full minhash-LSH recomputation: md5-half permutations, 8 bands of 4,
    * band-equality candidates, exact-Jaccard verify.
    */
  /** The shared minhash-pair CTE chain (corpus -> shingles -> md5-half
    * permutation signatures -> band-equality candidates -> exact
    * Jaccard), ending in `jac(a, b, j)`.
    */
  private def minhashPairsCtes: String = {
    val sigCols = (0 until 32).map(i => s"MIN(${wrappedPerm(i)}) AS m$i").mkString(",\n    ")
    val bandEq = (0 until 8).map { b =>
      (0 until 4).map(r => s"x.m${b * 4 + r} = y.m${b * 4 + r}").mkString("(", " AND ", ")")
    }.mkString("\n      OR ")
    s"""$corpusCte,
       |${shinglesCtes("corpus")},
       |hs AS (SELECT doc_id, unnest(s) AS sg FROM sh),
       |hv AS (SELECT doc_id,
       |    md5_number_lower(sg)::HUGEINT AS h1,
       |    md5_number_upper(sg)::HUGEINT AS h2 FROM hs),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hv GROUP BY doc_id),
       |cand AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM sig x JOIN sig y ON x.doc_id < y.doc_id
       |    AND ($bandEq)),
       |jac AS (
       |  SELECT c.a, c.b, $jaccardExpr AS j
       |  FROM cand c JOIN sh sa ON c.a = sa.doc_id JOIN sh sb ON c.b = sb.doc_id)""".stripMargin
  }

  private def minhashOracle: String =
    s"""WITH $minhashPairsCtes
       |SELECT a, b, round(j, 6) AS jaccard FROM jac
       |WHERE j >= 0.9 ORDER BY a, b""".stripMargin

  /** Cross-corpus minhash recomputation over a combined-corpus CTE
    * (named `allc`): signatures for both sides, candidates restricted to
    * (ref, fresh) band collisions per the id-space predicates, exact-
    * Jaccard verify — the shared SQL twin of
    * [[graft.operators.Dedup.nearDupsAgainstMinhash]].
    */
  private def crossMinhashOracle(allcSql: String, refPred: String,
      newPred: String, threshold: Double): String = {
    val sigCols = (0 until 32).map(i => s"MIN(${wrappedPerm(i)}) AS m$i").mkString(",\n    ")
    val bandEq = (0 until 8).map { b =>
      (0 until 4).map(r => s"x.m${b * 4 + r} = y.m${b * 4 + r}").mkString("(", " AND ", ")")
    }.mkString("\n      OR ")
    s"""WITH allc AS (
       |$allcSql),
       |${shinglesCtes("allc")},
       |hs AS (SELECT doc_id, unnest(s) AS sg FROM sh),
       |hv AS (SELECT doc_id,
       |    md5_number_lower(sg)::HUGEINT AS h1,
       |    md5_number_upper(sg)::HUGEINT AS h2 FROM hs),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hv GROUP BY doc_id),
       |cand AS (
       |  SELECT x.doc_id AS ref_id, y.doc_id AS new_id
       |  FROM sig x JOIN sig y ON (${refPred.replace("doc_id", "x.doc_id")})
       |    AND (${newPred.replace("doc_id", "y.doc_id")})
       |    AND ($bandEq)),
       |jac AS (
       |  SELECT c.ref_id, c.new_id, $jaccardExpr AS j
       |  FROM cand c JOIN sh sa ON c.ref_id = sa.doc_id
       |    JOIN sh sb ON c.new_id = sb.doc_id)
       |SELECT ref_id, new_id, round(j, 6) AS jaccard FROM jac
       |WHERE j >= $threshold ORDER BY ref_id, new_id""".stripMargin
  }

  /** Incremental-dedup recomputation: fresh ids carry the +1000000
    * offset.
    */
  private def minhashIncrOracle: String = crossMinhashOracle(
    """  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
      |    CASE WHEN doc_id < 250 THEN text
      |         ELSE text || ' zznew zztoken zzmark' END AS text
      |  FROM documents""".stripMargin,
    refPred = "doc_id < 1000000", newPred = "doc_id >= 1000000",
    threshold = 0.5)

  /** The streaming-replay oracle: ONE signature computation over seed +
    * all three batches (seed at base ids, batch k at +(k+1)e6), then per
    * batch a candidate join restricted to (everything admitted before
    * it) x (the batch) — ids below the batch's offset ARE the prior
    * state, so the three bounds replay [[graft.streaming.StreamingDedup]]
    * exactly — exact-Jaccard verify, UNION ALL with the batch id.
    */
  private def streamReplayOracle: String = {
    val sigCols = (0 until 32).map(i => s"MIN(${wrappedPerm(i)}) AS m$i")
      .mkString(",\n    ")
    val bandEq = (0 until 8).map { b =>
      (0 until 4).map(r => s"x.m${b * 4 + r} = y.m${b * 4 + r}")
        .mkString("(", " AND ", ")")
    }.mkString("\n      OR ")
    val perturbed =
      "CASE WHEN doc_id % 2 = 0 THEN text ELSE text || ' zzre zzplay zzmark' END"
    val batchArms = (1 to 3).map(k =>
      s"  UNION ALL SELECT doc_id + ${k}000000 AS doc_id, $perturbed AS text FROM base")
      .mkString("\n")
    val perBatch = (0 until 3).map { k =>
      val lo = (k + 1) * 1000000L
      val hi = (k + 2) * 1000000L
      s"""  SELECT $k AS batch, c.ref_id, c.new_id, $jaccardExpr AS j
         |  FROM (SELECT x.doc_id AS ref_id, y.doc_id AS new_id
         |    FROM sig x JOIN sig y ON x.doc_id < $lo
         |      AND y.doc_id >= $lo AND y.doc_id < $hi
         |      AND ($bandEq)) c
         |  JOIN sh sa ON c.ref_id = sa.doc_id
         |  JOIN sh sb ON c.new_id = sb.doc_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |allc AS (
       |  SELECT doc_id, text FROM base
       |$batchArms),
       |${shinglesCtes("allc")},
       |hs AS (SELECT doc_id, unnest(s) AS sg FROM sh),
       |hv AS (SELECT doc_id,
       |    md5_number_lower(sg)::HUGEINT AS h1,
       |    md5_number_upper(sg)::HUGEINT AS h2 FROM hs),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hv GROUP BY doc_id),
       |pairs AS (
       |$perBatch)
       |SELECT batch, ref_id, new_id, round(j, 6) AS jaccard FROM pairs
       |WHERE j >= 0.5 ORDER BY batch, ref_id, new_id""".stripMargin
  }

  /** The embedding replay oracle: one RHP band-key computation (the
    * exact plane literals the Spark plan embeds) over seed + batches,
    * then per batch a candidate join bounded to (everything admitted
    * before it) x (the batch), exact cosine verify, UNION ALL with the
    * batch id — the SQL twin of
    * [[graft.streaming.StreamingEmbeddingDedup]]'s admit sequence.
    */
  private def streamEmbReplayOracle: String = {
    def plane(b: Int): String =
      (0 until 64).map(d => Similarity.planeComponent(b, d).toString)
        .mkString("[", ", ", "]")
    val bitCols = (0 until 384).map(b =>
      s"(CASE WHEN list_dot_product(v, ${plane(b)}) >= 0 THEN 1 ELSE 0 END) AS b$b")
      .mkString(",\n    ")
    val keyCols = (0 until 24).map { band =>
      val expr = (0 until 16).map(r => s"b${band * 16 + r}")
        .reduce((acc, b) => s"($acc * 2 + $b)")
      s"$expr AS k$band"
    }.mkString(",\n    ")
    val bandEq = (0 until 24).map(b => s"l.k$b = r.k$b").mkString(" OR ")
    val perturbed =
      "CASE WHEN vec_id % 2 = 0 THEN v ELSE list_transform(v, x -> x + 0.05) END"
    val batchArms = (1 to 3).map(k =>
      s"  UNION ALL SELECT vec_id + ${k}000000 AS vec_id, $perturbed AS v FROM base")
      .mkString("\n")
    val perBatch = (0 until 3).map { k =>
      val lo = (k + 1) * 1000000L
      val hi = (k + 2) * 1000000L
      s"""  SELECT $k AS batch, sc.ref_id, sc.new_id, $cosExpr AS cos0 FROM (
         |    SELECT cd.ref_id, cd.new_id, va.v AS qv, vb.v AS cv FROM (
         |      SELECT DISTINCT l.vec_id AS ref_id, r.vec_id AS new_id
         |      FROM bd l JOIN bd r ON l.vec_id < $lo
         |        AND r.vec_id >= $lo AND r.vec_id < $hi
         |        AND ($bandEq)) cd
         |    JOIN e va ON cd.ref_id = va.vec_id
         |    JOIN e vb ON cd.new_id = vb.vec_id) sc""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE vec_id % 5 = 0),
       |e AS (
       |  SELECT vec_id, v FROM base
       |$batchArms),
       |sg AS (SELECT vec_id, v,
       |    $bitCols
       |  FROM e),
       |bd AS (SELECT vec_id,
       |    $keyCols
       |  FROM sg),
       |pairs AS (
       |$perBatch)
       |SELECT batch, ref_id, new_id, round(cos0, 6) AS cos FROM pairs
       |WHERE cos0 >= 0.75 ORDER BY batch, ref_id, new_id""".stripMargin
  }

  /** The semantic (SemDeDup) replay oracle: the deterministic centroid
    * training ([[ivfOracle]] recipe) runs over the SEED corpus only —
    * exactly what [[graft.streaming.StreamingSemanticDedup.seed]]
    * persists — then every vector (seed + batches) assigns a cell with
    * those centroids and each batch pairs within shared cells against
    * the ids admitted before it.
    */
  private def streamSemReplayOracle: String = {
    val meanCols = (0 until 64).map(d => s"round(avg(v[${d + 1}]), 3) AS m$d")
      .mkString(",\n    ")
    val centList = (0 until 64).map(d => s"coalesce(m.m$d, round(s.v[${d + 1}], 3))")
      .mkString("[", ", ", "]")
    val hSigned = "(md5_number_lower(CAST(vec_id AS VARCHAR))::HUGEINT - " +
      "CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR)) >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    val perturbed =
      "CASE WHEN vec_id % 2 = 0 THEN v ELSE list_transform(v, x -> x + 0.05) END"
    val batchArms = (1 to 3).map(k =>
      s"  UNION ALL SELECT vec_id + ${k}000000 AS vec_id, $perturbed AS v FROM base")
      .mkString("\n")
    val perBatch = (0 until 3).map { k =>
      val lo = (k + 1) * 1000000L
      val hi = (k + 2) * 1000000L
      s"""  SELECT $k AS batch, sc.ref_id, sc.new_id, sc.cell, $cosExpr AS cos0 FROM (
         |    SELECT l.vec_id AS ref_id, r.vec_id AS new_id, l.cell,
         |      l.v AS qv, r.v AS cv
         |    FROM cellof l JOIN cellof r ON l.cell = r.cell
         |      AND l.vec_id < $lo
         |      AND r.vec_id >= $lo AND r.vec_id < $hi) sc""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE vec_id % 5 = 0),
       |e AS (
       |  SELECT vec_id, v FROM base
       |$batchArms),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY $hSigned, vec_id) - 1 AS cell, v
       |  FROM base
       |  ORDER BY $hSigned, vec_id LIMIT 16),
       |a0 AS (
       |  SELECT b.vec_id, b.v, s.cell,
       |    list_dot_product(b.v, s.v) / sqrt(list_dot_product(s.v, s.v)) AS score
       |  FROM base b CROSS JOIN seeds s),
       |b0 AS (
       |  SELECT vec_id, v, cell FROM a0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |m AS (SELECT cell,
       |    $meanCols
       |  FROM b0 GROUP BY cell),
       |cent AS (
       |  SELECT s.cell, $centList AS cv
       |  FROM seeds s LEFT JOIN m ON s.cell = m.cell),
       |ac AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |    list_dot_product(e.v, c.cv) / sqrt(list_dot_product(c.cv, c.cv)) AS score
       |  FROM e CROSS JOIN cent c),
       |cellof AS (
       |  SELECT vec_id, v, cell FROM ac
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |pairs AS (
       |$perBatch)
       |SELECT batch, ref_id, new_id, CAST(cell AS INT) AS cell,
       |  round(cos0, 6) AS cos FROM pairs
       |WHERE cos0 >= 0.75 ORDER BY batch, ref_id, new_id""".stripMargin
  }

  /** Exact 8-gram decontamination over the planted corpus (benchmark =
    * docs < 20; 100 shifted docs contaminated with a benchmark span).
    * Shared by text_decontaminate and text_decontaminate_bloom — the
    * Bloom prefilter never changes the answer, only the plan.
    */
  private def decontaminateExactOracle: String = {
    val words8 =
      "string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')"
    val sh8 = """CASE WHEN len(words) < 8 THEN [array_to_string(words, ' ')]
      |    ELSE list_transform(range(1, len(words) - 6),
      |           i -> array_to_string(words[i:i+7], ' ')) END""".stripMargin
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       |w0 AS (SELECT doc_id, $words8 AS words FROM d),
       |spans AS (SELECT doc_id AS bid, array_to_string(words[1:8], ' ') AS span
       |  FROM w0 WHERE doc_id < 20),
       |planted AS (
       |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || s.span AS text
       |  FROM d JOIN spans s ON d.doc_id % 20 = s.bid
       |  WHERE d.doc_id >= 100 AND d.doc_id < 200),
       |corpus AS (SELECT doc_id, text FROM d
       |  UNION ALL SELECT doc_id, text FROM planted),
       |cw AS (SELECT doc_id, $words8 AS words FROM corpus),
       |csh AS (SELECT doc_id, unnest($sh8) AS sg FROM cw),
       |bw AS (SELECT doc_id, $words8 AS words FROM d WHERE doc_id < 20),
       |bsh AS (SELECT DISTINCT unnest($sh8) AS sg FROM bw)
       |SELECT DISTINCT doc_id FROM csh WHERE sg IN (SELECT sg FROM bsh)
       |ORDER BY doc_id""".stripMargin
  }

  /** Fuzzy decontamination: near-copies of benchmark docs (planted at
    * +2000000 with an id-salted suffix) flagged by cross-corpus minhash
    * against the benchmark set (doc_id < 20).
    */
  private def decontaminateFuzzyOracle: String = crossMinhashOracle(
    """  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT p.doc_id + 2000000 AS doc_id,
      |    b.text || ' zz' || CAST(p.doc_id AS VARCHAR) AS text
      |  FROM documents p JOIN documents b ON b.doc_id = p.doc_id % 20
      |  WHERE p.doc_id >= 100 AND p.doc_id < 150""".stripMargin,
    refPred = "doc_id < 20", newPred = "doc_id >= 20",
    threshold = 0.5)

  /** End-to-end dedup: the minhash pair set closed into components with
    * a recursive transitive closure, then the canonical-survivor rule —
    * the oracle twin of `nearDupPairsMinhash |> cluster`.
    */
  private def minhashClusterOracle: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |p AS (SELECT a, b FROM jac WHERE j >= 0.9),
       |und AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT u, u FROM und
       |  UNION
       |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |ids AS (SELECT doc_id AS id FROM corpus)
       |SELECT i.id, coalesce(comp.component, i.id) AS component,
       |  i.id = coalesce(comp.component, i.id) AS keep
       |FROM ids i LEFT JOIN comp ON i.id = comp.id
       |ORDER BY i.id""".stripMargin

  /** Full simhash recomputation: md5-lower token hashes, 64 sign
    * counters, 4x16-bit banding, hamming verify.
    */
  private def simhashOracle: String = {
    val cntCols = (0 until 64).map(j =>
      s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS c$j").mkString(",\n    ")
    val sigExpr = (0 until 64).map(j =>
      s"CASE WHEN c$j > 0 THEN ${BigInt(1) << j}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" + ")
    val bandEq = (0 until 4).map(b =>
      s"((l.sh >> ${b * 16}) & 65535) = ((r.sh >> ${b * 16}) & 65535)")
      .mkString("\n      OR ")
    s"""WITH $corpusCte,
       |tk AS (SELECT doc_id,
       |    unnest(string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')) AS tok
       |  FROM corpus),
       |hv AS (SELECT doc_id, md5_number_lower(tok) AS h FROM tk),
       |cnt AS (SELECT doc_id,
       |    $cntCols
       |  FROM hv GROUP BY doc_id),
       |sig AS (SELECT doc_id, ($sigExpr) AS sh FROM cnt),
       |pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b,
       |    CAST(bit_count(xor(l.sh, r.sh)) AS INT) AS hamming
       |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
       |    AND ($bandEq))
       |SELECT a, b, hamming FROM pairs WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }

  /** [[simhashOracle]] with the multi-probe wide-recall gate: a pair is
    * a candidate when some 16-bit band differs in <= 1 bit (the 1-bit
    * probe ball), recall-exact for hamming <= 6.
    */
  private def simhashWideOracle: String = {
    val cntCols = (0 until 64).map(j =>
      s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS c$j").mkString(",\n    ")
    val sigExpr = (0 until 64).map(j =>
      s"CASE WHEN c$j > 0 THEN ${BigInt(1) << j}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" + ")
    val bandNear = (0 until 4).map(b =>
      s"bit_count(xor((l.sh >> ${b * 16}) & 65535, (r.sh >> ${b * 16}) & 65535)) <= 1")
      .mkString("\n      OR ")
    s"""WITH $corpusCte,
       |tk AS (SELECT doc_id,
       |    unnest(string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')) AS tok
       |  FROM corpus),
       |hv AS (SELECT doc_id, md5_number_lower(tok) AS h FROM tk),
       |cnt AS (SELECT doc_id,
       |    $cntCols
       |  FROM hv GROUP BY doc_id),
       |sig AS (SELECT doc_id, ($sigExpr) AS sh FROM cnt),
       |pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b,
       |    CAST(bit_count(xor(l.sh, r.sh)) AS INT) AS hamming
       |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
       |    AND ($bandNear))
       |SELECT a, b, hamming FROM pairs WHERE hamming <= 6 ORDER BY a, b""".stripMargin
  }

  private val cosExpr =
    "CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0 THEN 0.0 " +
      "ELSE list_dot_product(qv, cv) / " +
      "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) END"

  /** Random-hyperplane LSH recomputation: the 16 plane literals are the
    * exact doubles the Spark plan embeds (same splitmix64 derivation).
    */
  private def lshOracle: String = {
    def plane(b: Int): String =
      (0 until 64).map(d => Similarity.planeComponent(b, d).toString)
        .mkString("[", ", ", "]")
    val bitCols = (0 until 16).map(b =>
      s"(CASE WHEN list_dot_product(v, ${plane(b)}) >= 0 THEN 1 ELSE 0 END) AS b$b")
      .mkString(",\n    ")
    val keyCols = (0 until 4).map { band =>
      val expr = (0 until 4).map(r => s"b${band * 4 + r}")
        .reduce((acc, b) => s"($acc * 2 + $b)")
      s"$expr AS k$band"
    }.mkString(",\n    ")
    // multi-probe: the corpus key matches the query key OR any 1-bit flip
    // of it — the identical probe set the Spark side explodes
    val bandEq = (0 until 4).map { b =>
      val probes = (s"q.k$b" +: (0 until 4).map(r => s"xor(q.k$b, ${1 << r})"))
        .mkString(", ")
      s"c.k$b IN ($probes)"
    }.mkString("\n      OR ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sg AS (SELECT vec_id, v,
       |    $bitCols
       |  FROM e),
       |bd AS (SELECT vec_id, v,
       |    $keyCols
       |  FROM sg),
       |cd AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nn_id, q.v AS qv, c.v AS cv
       |  FROM bd q JOIN bd c ON q.vec_id < 20 AND c.vec_id <> q.vec_id
       |    AND ($bandEq)),
       |sc AS (SELECT query_id, nn_id, $cosExpr AS cos0 FROM cd)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
       |  nn_id, round(cos0, 6) AS cos
       |FROM sc QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Corpus-wide embedding near-dup recomputation: the 384 plane literals
    * (same splitmix64 doubles as the Spark plan), 24x16-bit banding over
    * the planted-twin corpus, band-equality candidate self-join, exact
    * cosine verify — mirrors [[Similarity.nearDupPairsEmbedding]] step
    * for step (incl. the scale-safe band width).
    */
  private def embeddingLshOracle: String = {
    def plane(b: Int): String =
      (0 until 64).map(d => Similarity.planeComponent(b, d).toString)
        .mkString("[", ", ", "]")
    val bitCols = (0 until 384).map(b =>
      s"(CASE WHEN list_dot_product(v, ${plane(b)}) >= 0 THEN 1 ELSE 0 END) AS b$b")
      .mkString(",\n    ")
    val keyCols = (0 until 24).map { band =>
      val expr = (0 until 16).map(r => s"b${band * 16 + r}")
        .reduce((acc, b) => s"($acc * 2 + $b)")
      s"$expr AS k$band"
    }.mkString(",\n    ")
    val bandEq = (0 until 24).map(b => s"l.k$b = r.k$b").mkString(" OR ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(v, x -> x + 0.05) AS v FROM base),
       |sg AS (SELECT vec_id, v,
       |    $bitCols
       |  FROM e),
       |bd AS (SELECT vec_id,
       |    $keyCols
       |  FROM sg),
       |cd AS (
       |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM bd l JOIN bd r ON l.vec_id < r.vec_id AND ($bandEq)),
       |sc AS (
       |  SELECT cd.a, cd.b, va.v AS qv, vb.v AS cv
       |  FROM cd JOIN e va ON cd.a = va.vec_id JOIN e vb ON cd.b = vb.vec_id),
       |scored AS (SELECT a, b, $cosExpr AS cos0 FROM sc)
       |SELECT a, b, round(cos0, 6) AS cos FROM scored
       |WHERE cos0 >= 0.75 ORDER BY a, b""".stripMargin
  }

  /** Incremental embedding-dedup recomputation: identical plane-literal
    * bands for reference (base ids) and fresh (+1000000 twins); the
    * candidate join keeps only cross-corpus band collisions.
    */
  private def embeddingIncrOracle: String = {
    def plane(b: Int): String =
      (0 until 64).map(d => Similarity.planeComponent(b, d).toString)
        .mkString("[", ", ", "]")
    val bitCols = (0 until 384).map(b =>
      s"(CASE WHEN list_dot_product(v, ${plane(b)}) >= 0 THEN 1 ELSE 0 END) AS b$b")
      .mkString(",\n    ")
    val keyCols = (0 until 24).map { band =>
      val expr = (0 until 16).map(r => s"b${band * 16 + r}")
        .reduce((acc, b) => s"($acc * 2 + $b)")
      s"$expr AS k$band"
    }.mkString(",\n    ")
    val bandEq = (0 until 24).map(b => s"l.k$b = r.k$b").mkString(" OR ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(v, x -> x + 0.05) AS v FROM base),
       |sg AS (SELECT vec_id, v,
       |    $bitCols
       |  FROM e),
       |bd AS (SELECT vec_id,
       |    $keyCols
       |  FROM sg),
       |cd AS (
       |  SELECT DISTINCT l.vec_id AS ref_id, r.vec_id AS new_id
       |  FROM bd l JOIN bd r ON l.vec_id < 1000000 AND r.vec_id >= 1000000
       |    AND ($bandEq)),
       |sc AS (
       |  SELECT cd.ref_id, cd.new_id, va.v AS qv, vb.v AS cv
       |  FROM cd JOIN e va ON cd.ref_id = va.vec_id
       |    JOIN e vb ON cd.new_id = vb.vec_id),
       |scored AS (SELECT ref_id, new_id, $cosExpr AS cos0 FROM sc)
       |SELECT ref_id, new_id, round(cos0, 6) AS cos FROM scored
       |WHERE cos0 >= 0.75 ORDER BY ref_id, new_id""".stripMargin
  }

  /** The shared centroid-derivation CTE prefix (e … cellof): re-trains
    * the identical [[graft.operators.Similarity.trainCentroids]]
    * centroids in SQL — md5-hash-sampled seeds, one Lloyd step with
    * round(mean, 3) — then assigns every vector its cell. Consumed by
    * [[ivfOracle]] (probe + re-rank on top) and the cluster-balanced
    * sampling oracle (per-cell hash-order cap on top).
    */
  private def ivfCellCtes: String = ivfCellCtesTrainedOn("e")

  /** [[ivfCellCtes]] with the TRAINING corpus (seed selection + the
    * Lloyd step) restricted to `trainRel` — a CTE name or inline
    * relation over (vec_id, v). Cell ASSIGNMENT (`ac`/`cellof`) always
    * runs over the full `e`: the standing-index admission lifecycle
    * trains once on the seed corpus and assigns later arrivals against
    * the frozen centroids ([[graft.operators.Similarity.IvfIndex
    * .appendAssigned]]).
    */
  private def ivfCellCtesTrainedOn(trainRel: String): String = {
    val meanCols = (0 until 64).map(d => s"round(avg(v[${d + 1}]), 3) AS m$d")
      .mkString(",\n    ")
    val centList = (0 until 64).map(d => s"coalesce(m.m$d, round(s.v[${d + 1}], 3))")
      .mkString("[", ", ", "]")
    // Spark orders seeds by the SIGNED md5 long; md5_number_lower is
    // UBIGINT, so reinterpret before ordering
    val hSigned = "(md5_number_lower(CAST(vec_id AS VARCHAR))::HUGEINT - " +
      "CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR)) >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY $hSigned, vec_id) - 1 AS cell, v
       |  FROM $trainRel
       |  ORDER BY $hSigned, vec_id LIMIT 16),
       |a0 AS (
       |  SELECT e.vec_id, e.v, s.cell,
       |    list_dot_product(e.v, s.v) / sqrt(list_dot_product(s.v, s.v)) AS score
       |  FROM $trainRel e CROSS JOIN seeds s),
       |b0 AS (
       |  SELECT vec_id, v, cell FROM a0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |m AS (SELECT cell,
       |    $meanCols
       |  FROM b0 GROUP BY cell),
       |cent AS (
       |  SELECT s.cell, $centList AS cv
       |  FROM seeds s LEFT JOIN m ON s.cell = m.cell),
       |ac AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |    list_dot_product(e.v, c.cv) / sqrt(list_dot_product(c.cv, c.cv)) AS score
       |  FROM e CROSS JOIN cent c),
       |cellof AS (
       |  SELECT vec_id, v, cell FROM ac
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1)"""
      .stripMargin
  }

  /** IVF recomputation: the [[ivfCellCtes]] centroids + cell
    * assignment, then probes 4 cells per query and re-ranks exactly.
    */
  private def ivfOracle: String = ivfOracleTail(ivfCellCtes)

  /** The appended-index oracle: centroids train on the EVEN-id half
    * (the seed corpus the index was built from), assignment covers the
    * union — what [[graft.operators.Similarity.IvfIndex.appendAssigned]]
    * must reproduce file-for-file.
    */
  private def ivfAppendedOracle: String = ivfOracleTail(
    ivfCellCtesTrainedOn("(SELECT vec_id, v FROM e WHERE vec_id % 2 = 0)"))

  private def ivfOracleTail(ctes: String): String = {
    s"""$ctes,
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, cell FROM ac WHERE vec_id < 20
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) <= 4),
       |sc AS (
       |  SELECT p.query_id, k.vec_id AS nn_id, p.qv, k.v AS cv
       |  FROM probes p JOIN cellof k ON p.cell = k.cell AND k.vec_id <> p.query_id),
       |scored AS (SELECT query_id, nn_id, $cosExpr AS cos0 FROM sc)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
       |  nn_id, round(cos0, 6) AS cos
       |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** PQ/ADC oracle: per-subspace codebook training (the ivfOracle
    * recipe over each 8-dim slice — seed rows are id-selected, so all
    * eight subspaces share them), per-subspace code assignment, the ADC
    * approximate score as a sum of subspace dot products against the
    * coded centroids (exactly what the Spark side's per-query lookup
    * tables compute), top-(k*rerank = 40) candidate cut, exact-cosine
    * re-rank to 5. All sizes derive from the m/sub/kCodes vals below —
    * keep them equal to the sim_topk_pq call's m/kCodes/rerank.
    */
  private def pqOracle: String = {
    val m = 8; val sub = 8; val kCodes = 16
    val hSigned = "(md5_number_lower(CAST(vec_id AS VARCHAR))::HUGEINT - " +
      "CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR)) >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    def lo(s: Int) = s * sub + 1
    def hi(s: Int) = (s + 1) * sub
    val perSub = (0 until m).map { s =>
      val meanCols = (0 until sub).map(d => s"round(avg(sv[${d + 1}]), 3) AS m$d")
        .mkString(", ")
      val centList = (0 until sub).map(d => s"coalesce(m.m$d, round(s.v[${lo(s) + d}], 3))")
        .mkString("[", ", ", "]")
      s"""a$s AS (
         |  SELECT e.vec_id, e.v[${lo(s)}:${hi(s)}] AS sv, s.cell,
         |    list_dot_product(e.v[${lo(s)}:${hi(s)}], s.v[${lo(s)}:${hi(s)}]) /
         |      sqrt(list_dot_product(s.v[${lo(s)}:${hi(s)}], s.v[${lo(s)}:${hi(s)}])) AS score
         |  FROM e CROSS JOIN seeds s),
         |b$s AS (
         |  SELECT vec_id, sv, cell FROM a$s
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
         |m$s AS (SELECT cell, $meanCols FROM b$s GROUP BY cell),
         |cent$s AS (
         |  SELECT s.cell, $centList AS cv
         |  FROM seeds s LEFT JOIN m$s m ON s.cell = m.cell),
         |code$s AS (
         |  SELECT e.vec_id, c.cell AS code
         |  FROM e CROSS JOIN cent$s c
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY
         |    list_dot_product(e.v[${lo(s)}:${hi(s)}], c.cv) /
         |      sqrt(list_dot_product(c.cv, c.cv)) DESC, c.cell) = 1)""".stripMargin
    }.mkString(",\n")
    val adcScore = (0 until m)
      .map(s => s"list_dot_product(q.qv[${lo(s)}:${hi(s)}], c$s.cv)")
      .mkString(" + ")
    val codeJoins = (0 until m)
      .map(s => s"JOIN code$s k$s ON k$s.vec_id = e.vec_id " +
        s"JOIN cent$s c$s ON c$s.cell = k$s.code")
      .mkString("\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY $hSigned, vec_id) - 1 AS cell, v
       |  FROM e ORDER BY $hSigned, vec_id LIMIT $kCodes),
       |$perSub,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
       |approx AS (
       |  SELECT q.query_id, e.vec_id AS nn_id, ($adcScore) AS ascore
       |  FROM q CROSS JOIN e
       |  $codeJoins
       |  WHERE e.vec_id <> q.query_id),
       |cand AS (
       |  SELECT query_id, nn_id FROM approx
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ascore DESC, nn_id) <= 40),
       |sc AS (
       |  SELECT cand.query_id, cand.nn_id, q.qv, e.v AS cv
       |  FROM cand JOIN q ON q.query_id = cand.query_id
       |  JOIN e ON e.vec_id = cand.nn_id),
       |scored AS (SELECT query_id, nn_id, $cosExpr AS cos0 FROM sc)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
       |  nn_id, round(cos0, 6) AS cos
       |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The IVF-PQ (IVFADC) composed oracle: the [[ivfCellCtes]] coarse
    * tier (renamed `ia../icent/iac/cellof` to avoid CTE collisions) for
    * cell assignment + per-query probes, the [[pqOracle]] per-subspace
    * codebook/code derivation verbatim, then ADC scoring RESTRICTED to
    * each query's probed cells, the k*rerank candidate cut, and exact
    * re-rank — the SQL twin of
    * [[graft.operators.Similarity.ivfPqTopK]]. nCells == kCodes == 16
    * here, so the coarse and subspace tiers share the `seeds` CTE
    * (seed selection depends only on ids).
    */
  private def ivfPqOracle: String = ivfPqOracleTrainedOn("e")

  /** The appended composed-index oracle: coarse centroids AND subspace
    * codebooks train on the even-id half (the seed corpus the index was
    * built from), assignment/encoding cover the union — what
    * [[graft.operators.Similarity.IvfPqIndex.append]] must reproduce.
    */
  private def ivfPqAppendedOracle: String = ivfPqOracleTrainedOn(
    "(SELECT vec_id, v FROM e WHERE vec_id % 2 = 0)")

  private def ivfPqOracleTrainedOn(trainRel: String): String = {
    val m = 8; val sub = 8; val kCodes = 16
    val hSigned = "(md5_number_lower(CAST(vec_id AS VARCHAR))::HUGEINT - " +
      "CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR)) >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    def lo(s: Int) = s * sub + 1
    def hi(s: Int) = (s + 1) * sub
    val perSub = (0 until m).map { s =>
      val meanCols = (0 until sub).map(d => s"round(avg(sv[${d + 1}]), 3) AS m$d")
        .mkString(", ")
      val centList = (0 until sub).map(d => s"coalesce(m.m$d, round(s.v[${lo(s) + d}], 3))")
        .mkString("[", ", ", "]")
      s"""a$s AS (
         |  SELECT e.vec_id, e.v[${lo(s)}:${hi(s)}] AS sv, s.cell,
         |    list_dot_product(e.v[${lo(s)}:${hi(s)}], s.v[${lo(s)}:${hi(s)}]) /
         |      sqrt(list_dot_product(s.v[${lo(s)}:${hi(s)}], s.v[${lo(s)}:${hi(s)}])) AS score
         |  FROM $trainRel e CROSS JOIN seeds s),
         |b$s AS (
         |  SELECT vec_id, sv, cell FROM a$s
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
         |m$s AS (SELECT cell, $meanCols FROM b$s GROUP BY cell),
         |cent$s AS (
         |  SELECT s.cell, $centList AS cv
         |  FROM seeds s LEFT JOIN m$s m ON s.cell = m.cell),
         |code$s AS (
         |  SELECT e.vec_id, c.cell AS code
         |  FROM e CROSS JOIN cent$s c
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY
         |    list_dot_product(e.v[${lo(s)}:${hi(s)}], c.cv) /
         |      sqrt(list_dot_product(c.cv, c.cv)) DESC, c.cell) = 1)""".stripMargin
    }.mkString(",\n")
    val adcScore = (0 until m)
      .map(s => s"list_dot_product(p.qv[${lo(s)}:${hi(s)}], c$s.cv)")
      .mkString(" + ")
    val codeJoins = (0 until m)
      .map(s => s"JOIN code$s k$s ON k$s.vec_id = k.vec_id " +
        s"JOIN cent$s c$s ON c$s.cell = k$s.code")
      .mkString("\n  ")
    val iMeanCols = (0 until 64).map(d => s"round(avg(v[${d + 1}]), 3) AS im$d")
      .mkString(",\n    ")
    val iCentList = (0 until 64).map(d => s"coalesce(m.im$d, round(s.v[${d + 1}], 3))")
      .mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY $hSigned, vec_id) - 1 AS cell, v
       |  FROM $trainRel ORDER BY $hSigned, vec_id LIMIT $kCodes),
       |ia AS (
       |  SELECT e.vec_id, e.v, s.cell,
       |    list_dot_product(e.v, s.v) / sqrt(list_dot_product(s.v, s.v)) AS score
       |  FROM $trainRel e CROSS JOIN seeds s),
       |ib AS (
       |  SELECT vec_id, v, cell FROM ia
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |im AS (SELECT cell,
       |    $iMeanCols
       |  FROM ib GROUP BY cell),
       |icent AS (
       |  SELECT s.cell, $iCentList AS cv
       |  FROM seeds s LEFT JOIN im m ON s.cell = m.cell),
       |iac AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |    list_dot_product(e.v, c.cv) / sqrt(list_dot_product(c.cv, c.cv)) AS score
       |  FROM e CROSS JOIN icent c),
       |cellof AS (
       |  SELECT vec_id, v, cell FROM iac
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, cell FROM iac WHERE vec_id < 20
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) <= 4),
       |$perSub,
       |approx AS (
       |  SELECT p.query_id, k.vec_id AS nn_id, ($adcScore) AS ascore
       |  FROM probes p JOIN cellof k ON p.cell = k.cell AND k.vec_id <> p.query_id
       |  $codeJoins),
       |cand AS (
       |  SELECT query_id, nn_id FROM approx
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ascore DESC, nn_id) <= 40),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
       |sc AS (
       |  SELECT cand.query_id, cand.nn_id, q.qv, e.v AS cv
       |  FROM cand JOIN q ON q.query_id = cand.query_id
       |  JOIN e ON e.vec_id = cand.nn_id),
       |scored AS (SELECT query_id, nn_id, $cosExpr AS cos0 FROM sc)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
       |  nn_id, round(cos0, 6) AS cos
       |FROM scored QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The streaming phash replay oracle: regenerate every variant's dHash
    * from the pixel arithmetic ([[mmPixelCtesFor]]), collapse each arm
    * (seed, batch 0..2) by fingerprint (rep = min id, clique = count —
    * the admit path's collapse-first default), then per batch the
    * band-probed representative pairs (the [[mmPhashOracle]] wide-recall
    * gate) bounded to (every version admitted before it) x (the batch),
    * folding state versions per fingerprint: ref_id = the all-time
    * minimum id, clique_ref = the summed multiplicity — the SQL twin of
    * [[graft.streaming.StreamingPhashDedup]]'s admit sequence.
    */
  private def streamPhashReplayOracle: String = {
    val bandEq = (0 until 4).map(b =>
      s"bit_count(xor((l.dh >> ${b * 16}) & 65535, (r.dh >> ${b * 16}) & 65535)) <= 1")
      .mkString("\n      OR ")
    val batchArms = (1 to 3).map(k =>
      s"  UNION ALL SELECT pid % 100, pid + ${k}000000, 8, " +
        s"CASE WHEN pid % 2 = 0 THEN 0 ELSE 1 END FROM ids")
      .mkString("\n")
    val perBatch = (0 until 3).map { k =>
      s"""  SELECT $k AS batch, min(l.id) AS ref_id, r.id AS new_id,
         |    CAST(bit_count(xor(l.dh, r.dh)) AS INT) AS hamming,
         |    CAST(sum(l.clique) AS BIGINT) AS clique_ref,
         |    r.clique AS clique_new
         |  FROM reps l JOIN reps r ON l.b < $k AND r.b = $k
         |    AND l.id <> r.id AND ($bandEq)
         |  WHERE bit_count(xor(l.dh, r.dh)) <= 7
         |  GROUP BY l.dh, r.dh, r.id, r.clique""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${mmPixelCtesFor(
        s"""SELECT pid, pid AS asset_id, 8 AS size, 0 AS noisy FROM ids
           |$batchArms""".stripMargin)},
       |reps AS (
       |  SELECT CASE WHEN asset_id < 1000000 THEN -1
       |              ELSE asset_id // 1000000 - 1 END AS b,
       |    dh, min(asset_id) AS id, count(*) AS clique
       |  FROM hs GROUP BY 1, 2),
       |pairs AS (
       |$perBatch)
       |SELECT batch, ref_id, new_id, hamming, clique_ref, clique_new
       |FROM pairs
       |ORDER BY batch, ref_id, new_id""".stripMargin
  }

  /** Regenerate [[graft.operators.Multimodal.syntheticAssets]]'s payload
    * hex dump (and byte length) from the id column alone — the oracle
    * twin of the REAL-binary fixture (same id-seeded byte arithmetic,
    * same edge lengths: 0, sub-frame, over-budget).
    */
  private def assetBytesCte(lenCol: String): String =
    s"""b AS (
       |  SELECT asset_id, len AS $lenCol,
       |    coalesce(list_aggregate(list_transform(range(0, len),
       |      j -> lpad(hex((asset_id * 31 + j * 7) % 256), 2, '0')),
       |      'string_agg', ''), '') AS h
       |  FROM (SELECT asset_id,
       |    CASE WHEN asset_id % 17 = 0 THEN 0
       |         WHEN asset_id % 17 = 1 THEN asset_id % 4
       |         WHEN asset_id % 17 = 2 THEN 5000
       |         ELSE (asset_id * 137) % 997 END AS len
       |    FROM (SELECT doc_id AS asset_id FROM documents)))""".stripMargin

  /** mm_features f0: exact integer byte sums over stride-8 positions of
    * the fixture bytes (via hex-nibble lookup), one double division, cast
    * through REAL — bit-parity with DecodeStub.decode.
    */
  private def mmFeaturesOracle: String = {
    val nib = "strpos('0123456789ABCDEF', %s) - 1"
    val hi = nib.format("substr(h, 2*i + 1, 1)")
    val lo = nib.format("substr(h, 2*i + 2, 1)")
    s"""WITH ${assetBytesCte("byte_len")},
       |s AS (
       |  SELECT asset_id, byte_len,
       |    coalesce(list_sum(list_transform(
       |      range(0, CAST(byte_len AS INT), 8),
       |      i -> ($hi) * 16 + ($lo))), 0) AS s0,
       |    greatest(1, byte_len // 8) AS stripe
       |  FROM b)
       |SELECT asset_id, byte_len,
       |  round(CAST(CAST(CASE WHEN byte_len = 0 THEN 0.0
       |    ELSE s0 / (255.0 * stripe) END AS REAL) AS DOUBLE), 6) AS f0
       |FROM s ORDER BY asset_id""".stripMargin
  }

  /** Shared CTEs for the REAL-decode oracles: regenerate the BMP
    * fixture's pixels from the id arithmetic alone (uncompressed 24-bit
    * BMP = header + raw bottom-up BGR rows, so the pixels ImageIO decodes
    * ARE the arithmetic — nothing format-side to re-derive), apply the
    * identical integer luma map, and fold the 9x8 nearest-grid dHash
    * exactly as [[graft.operators.Multimodal.dHash64]] (bit `j*8+i` via
    * power-of-two literals — DuckDB's `<<` overflows at bit 63, the
    * [[simhashOracle]] lesson). Junk payloads (ids + 3000000) never
    * appear: the decode DROPS undecodable bytes.
    */
  private def mmPixelCtes(withNoisy: Boolean): String = {
    val noisyRow = if (withNoisy)
      "\n  UNION ALL SELECT pid, pid + 2000000, 8, 1 FROM ids" else ""
    mmPixelCtesFor(
      s"""SELECT pid, pid AS asset_id, 8 AS size, 0 AS noisy FROM ids
         |  UNION ALL SELECT pid, pid + 1000000, 16, 0 FROM ids$noisyRow""".stripMargin)
  }

  /** [[mmPixelCtes]] over an arbitrary variant list — `variants` must
    * yield (pid, asset_id, size, noisy) rows over the `ids` CTE.
    */
  private def mmPixelCtesFor(variants: String): String = {
    val pow2 = (0 until 64).map(p => (BigInt(1) << p).toString)
      .mkString("[", ", ", "]")
    def lumaOf(src: String) =
      s"""(299 * ((base * 7 + 23) % 256) + 587 * ((base * 3 + 11) % 256)
         |      + 114 * (base % 256)) // 1000 AS luma FROM $src""".stripMargin
    val noiseCase =
      """CASE WHEN noisy = 1 AND xx = 1 AND yy = 2 THEN 40
        |      WHEN noisy = 1 AND xx = 5 AND yy = 6 THEN 60
        |      ELSE 0 END""".stripMargin
    s"""ids AS (SELECT doc_id AS pid FROM documents WHERE doc_id < 300),
       |a AS ($variants),
       |px AS (
       |  SELECT asset_id, size, pid, noisy,
       |    unnest(generate_series(0, size * size - 1)) AS p
       |  FROM a),
       |cell AS (
       |  SELECT asset_id, pid, noisy,
       |    (((p % size) * 8) // size) AS xx, (((p // size) * 8) // size) AS yy
       |  FROM px),
       |basep AS (
       |  SELECT asset_id,
       |    pid * 31 + yy * 19 + xx * 7 + $noiseCase AS base
       |  FROM cell),
       |lum AS (SELECT asset_id,
       |    ${lumaOf("basep")}),
       |gp AS (
       |  SELECT asset_id, size, pid, noisy,
       |    unnest(generate_series(0, 71)) AS g
       |  FROM a),
       |gc AS (
       |  SELECT asset_id, pid, noisy, (g % 9) AS i, (g // 9) AS j,
       |    (((((g % 9) * size) // 9) * 8) // size) AS xx,
       |    (((((g // 9) * size) // 8) * 8) // size) AS yy
       |  FROM gp),
       |gb AS (
       |  SELECT asset_id, i, j,
       |    pid * 31 + yy * 19 + xx * 7 + $noiseCase AS base
       |  FROM gc),
       |gl AS (SELECT asset_id, i, j,
       |    ${lumaOf("gb")}),
       |bits AS (
       |  SELECT l.asset_id, l.j * 8 + l.i AS bp,
       |    CASE WHEN l.luma > r.luma THEN 1 ELSE 0 END AS bit
       |  FROM gl l JOIN gl r
       |    ON l.asset_id = r.asset_id AND l.j = r.j AND r.i = l.i + 1
       |  WHERE l.i < 8),
       |hs AS (
       |  SELECT asset_id,
       |    CAST(SUM(CASE WHEN bit = 1 THEN ($pow2::UBIGINT[])[bp + 1]
       |             ELSE 0::UBIGINT END) AS UBIGINT) AS dh
       |  FROM bits GROUP BY asset_id)""".stripMargin
  }

  private def mmDecodeRealOracle: String =
    s"""WITH ${mmPixelCtes(withNoisy = false)},
       |st AS (
       |  SELECT asset_id, CAST(SUM(luma) AS BIGINT) AS gray_sum,
       |    CAST(MIN(luma) AS INT) AS gray_min,
       |    CAST(MAX(luma) AS INT) AS gray_max
       |  FROM lum GROUP BY asset_id)
       |SELECT a.asset_id, CAST(a.size AS INT) AS width,
       |  CAST(a.size AS INT) AS height,
       |  st.gray_sum, st.gray_min, st.gray_max,
       |  lpad(hex(hs.dh), 16, '0') AS dhash_hex
       |FROM a JOIN st USING (asset_id) JOIN hs USING (asset_id)
       |ORDER BY a.asset_id""".stripMargin

  /** Wide-recall candidate gate mirroring the Spark side's multi-probe
    * banding: some 16-bit band differs in <= 1 bit (the 1-bit probe
    * ball) — recall-complete for hamming <= 7 by pigeonhole, like the
    * single-byte gate it replaced, but replaying the ACTUAL candidate
    * generation.
    */
  private def mmPhashOracle: String = {
    val bandEq = (0 until 4).map(b =>
      s"bit_count(xor((l.dh >> ${b * 16}) & 65535, (r.dh >> ${b * 16}) & 65535)) <= 1")
      .mkString("\n      OR ")
    // collapse-first (the operator's clique-safe default): identical
    // hashes fold to (rep = min id, clique = count) before pairing
    s"""WITH ${mmPixelCtes(withNoisy = true)},
       |cl AS (
       |  SELECT dh, min(asset_id) AS rep, count(*) AS clique
       |  FROM hs GROUP BY dh),
       |pairs AS (
       |  SELECT l.rep AS a, r.rep AS b,
       |    CAST(bit_count(xor(l.dh, r.dh)) AS INT) AS hamming,
       |    l.clique AS clique_a, r.clique AS clique_b
       |  FROM cl l JOIN cl r ON l.rep < r.rep
       |    AND ($bandEq))
       |SELECT a, b, hamming, clique_a, clique_b FROM pairs
       |WHERE hamming <= 6 ORDER BY a, b""".stripMargin
  }

  /** The streaming capstone's oracle: replays the decontamination state
    * timeline in plain SQL (batches < 2 gate against the SEED gram set
    * alone; batch 2 sees the release folded in at id 1), then runs the
    * batch-stage SQL of the `corpus_pipeline` oracle per batch.
    */
  private def corpusPipelineStreamOracle: String = {
    val words8 =
      "string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')"
    def sh8(w: String) = s"""CASE WHEN len($w) < 8 THEN [array_to_string($w, ' ')]
      |    ELSE list_transform(range(1, len($w) - 6),
      |           i -> array_to_string($w[i:i+7], ' ')) END""".stripMargin
    val stopHits = TextAnalysis.enStopwords.map { w =>
      s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
    }.mkString(" + ")
    val email = TextAnalysis.piiEmailRe
    val ipv4 = TextAnalysis.piiIpv4Re
    val num = TextAnalysis.piiLongNumRe
    s"""WITH d AS (SELECT doc_id, text, source FROM documents),
       |w0 AS (SELECT doc_id, $words8 AS words FROM d),
       |b0g AS (SELECT DISTINCT unnest(list_distinct(${sh8("words")})) AS sg
       |  FROM w0 WHERE doc_id < 20),
       |b1g AS (SELECT DISTINCT unnest(list_distinct(${sh8("words")})) AS sg
       |  FROM w0 WHERE doc_id >= 20 AND doc_id < 40),
       |spans0 AS (SELECT doc_id % 20 AS bid,
       |    array_to_string(words[1:8], ' ') AS span
       |  FROM w0 WHERE doc_id < 20),
       |spans1 AS (SELECT doc_id % 20 AS bid,
       |    array_to_string(words[1:8], ' ') AS span
       |  FROM w0 WHERE doc_id >= 20 AND doc_id < 40),
       |base AS (SELECT doc_id, text, source FROM d WHERE doc_id % 5 = 0),
       |raw AS (
       |  SELECT doc_id, text, source FROM base
       |    WHERE doc_id % 4 != 1 AND doc_id % 4 != 3
       |  UNION ALL SELECT doc_id + 500000, text, source FROM base
       |    WHERE doc_id % 4 = 2
       |  UNION ALL SELECT b.doc_id, b.text || ' ' || s.span, b.source
       |    FROM base b JOIN spans0 s ON b.doc_id % 20 = s.bid
       |    WHERE b.doc_id % 4 = 1
       |  UNION ALL SELECT b.doc_id, b.text || ' ' || s.span, b.source
       |    FROM base b JOIN spans1 s ON b.doc_id % 20 = s.bid
       |    WHERE b.doc_id % 4 = 3),
       |batches AS (
       |  SELECT 0 AS batch, doc_id + 1000000 AS doc_id, text, source FROM raw
       |  UNION ALL SELECT 1, doc_id + 2000000, text, source FROM raw
       |  UNION ALL SELECT 2, doc_id + 3000000, text, source FROM raw),
       |bw AS (SELECT batch, doc_id, $words8 AS words FROM batches),
       |g AS (SELECT batch, doc_id,
       |    unnest(list_distinct(${sh8("words")})) AS sg FROM bw),
       |contam AS (
       |  SELECT DISTINCT batch, doc_id FROM g
       |  WHERE sg IN (SELECT sg FROM b0g)
       |     OR (batch >= 2 AND sg IN (SELECT sg FROM b1g))),
       |clean AS (
       |  SELECT b.batch, b.doc_id, b.text, b.source FROM batches b
       |  WHERE NOT EXISTS (SELECT 1 FROM contam c
       |    WHERE c.batch = b.batch AND c.doc_id = b.doc_id)),
       |dedup AS (
       |  SELECT batch, doc_id, text, source FROM (
       |    SELECT batch, doc_id, text, source, row_number() OVER (
       |      PARTITION BY batch, md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn
       |    FROM clean)
       |  WHERE rn = 1),
       |gm AS (
       |  SELECT batch, doc_id, text, source,
       |    CASE WHEN trim(text) = '' THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
       |    $stopHits AS stop_hits,
       |    $words8 AS w
       |  FROM dedup),
       |gk AS (
       |  SELECT batch, doc_id, text, source FROM gm
       |  WHERE n_words >= 20 AND n_words <= 100000
       |    AND (CASE WHEN n_words = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_words END) >= 3.0
       |    AND (CASE WHEN n_words = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_words END) <= 10.0
       |    AND (CASE WHEN trim(text) = '' THEN 0.0
       |      ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) END) >= 0.8
       |    AND stop_hits >= 2),
       |scr AS (
       |  SELECT batch, doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '<EMAIL>', 'g'),
       |      '$ipv4', '<IP>', 'g'),
       |      '$num', '<NUM>', 'g') AS text
       |  FROM gk),
       |b AS (
       |  SELECT batch, doc_id, source, text, $bucketExpr AS bucket,
       |    row_number() OVER (PARTITION BY batch, source
       |      ORDER BY $bucketExpr, doc_id) AS rn
       |  FROM scr),
       |capped AS (SELECT batch, doc_id, source, text, bucket FROM b WHERE rn <= 20),
       |sp AS (
       |  SELECT batch, source, text,
       |    CASE WHEN bucket < 9000 THEN 'train' ELSE 'val' END AS split
       |  FROM capped)
       |SELECT batch, split, source, count(*) AS n,
       |  CAST(sum(CASE WHEN trim(text) = '' THEN 0
       |    ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS n_tokens
       |FROM sp GROUP BY batch, split, source
       |ORDER BY batch, split, source""".stripMargin
  }

  /** [[mmPhashOracle]] at the DEFAULT banding: 4×16-bit bands (the band
    * clause is recall-redundant for hamming <= 3 by pigeonhole, mirrored
    * here anyway so the oracle replays the exact candidate generation).
    */
  private def mmPhashTightOracle: String = {
    val bandEq = (0 until 4).map(b =>
      s"((l.dh >> ${b * 16}) & 65535) = ((r.dh >> ${b * 16}) & 65535)")
      .mkString("\n      OR ")
    s"""WITH ${mmPixelCtes(withNoisy = true)},
       |cl AS (
       |  SELECT dh, min(asset_id) AS rep, count(*) AS clique
       |  FROM hs GROUP BY dh),
       |pairs AS (
       |  SELECT l.rep AS a, r.rep AS b,
       |    CAST(bit_count(xor(l.dh, r.dh)) AS INT) AS hamming,
       |    l.clique AS clique_a, r.clique AS clique_b
       |  FROM cl l JOIN cl r ON l.rep < r.rep
       |    AND ($bandEq))
       |SELECT a, b, hamming, clique_a, clique_b FROM pairs
       |WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }

  /** Shared CTEs for the REAL audio-decode oracles: regenerate the WAV
    * fixture's PCM samples from the id arithmetic alone (uncompressed
    * PCM = headers + raw LE samples, so what [[graft.operators.Multimodal
    * .WavDecoder]] parses IS the arithmetic) and fold the 65-window
    * energy-gradient fingerprint exactly as [[graft.operators.Multimodal
    * .audioFingerprint64]]. n = 260 = 65*4 makes every window exactly 4
    * samples, so window-of-k is plain `k // 4`. Junk payloads never
    * appear: the decode DROPS undecodable bytes.
    */
  private def mmAudioCtes(variants: String): String = {
    val pow2 = (0 until 64).map(p => (BigInt(1) << p).toString)
      .mkString("[", ", ", "]")
    s"""ids AS (SELECT doc_id AS pid FROM documents WHERE doc_id < 300),
       |a AS ($variants),
       |s AS (
       |  SELECT asset_id, pid, bits, gain, noisy, mute,
       |    unnest(generate_series(0, 259)) AS k
       |  FROM a),
       |v AS (
       |  SELECT asset_id, k,
       |    CASE WHEN mute = 1 AND k >= 130 AND k < 195 THEN 0
       |      WHEN bits = 8
       |      THEN ((pid * 31 + k * (7 + pid % 97)) % 256) - 128
       |      ELSE (((pid * 31 + k * (7 + pid % 97)) % 2048) - 1024
       |        + CASE WHEN noisy = 1 AND k >= 65 AND k < 81
       |            THEN 300 ELSE 0 END) * gain END AS v
       |  FROM s),
       |e AS (SELECT asset_id, k // 4 AS j, SUM(abs(v)) AS e
       |  FROM v GROUP BY 1, 2),
       |ebits AS (
       |  SELECT l.asset_id, l.j AS bp,
       |    CASE WHEN l.e > r.e THEN 1 ELSE 0 END AS bit
       |  FROM e l JOIN e r ON l.asset_id = r.asset_id AND r.j = l.j + 1
       |  WHERE l.j < 64),
       |hs AS (
       |  SELECT asset_id,
       |    CAST(SUM(CASE WHEN bit = 1 THEN ($pow2::UBIGINT[])[bp + 1]
       |             ELSE 0::UBIGINT END) AS UBIGINT) AS afp
       |  FROM ebits GROUP BY asset_id)""".stripMargin
  }

  private def mmAudioDecodeOracle: String =
    s"""WITH ${mmAudioCtes(
        """SELECT pid, pid AS asset_id, 16 AS bits, 1 AS gain, 0 AS noisy,
          |    0 AS mute FROM ids
          |  UNION ALL SELECT pid, pid + 1000000, 16, 2, 0, 0 FROM ids
          |  UNION ALL SELECT pid, pid + 2000000, 8, 1, 0, 0 FROM ids""".stripMargin)},
       |st AS (
       |  SELECT asset_id, CAST(SUM(abs(v)) AS BIGINT) AS abs_sum,
       |    CAST(MAX(abs(v)) AS INT) AS peak
       |  FROM v GROUP BY asset_id)
       |SELECT a.asset_id, 8000 AS sample_rate, 1 AS channels,
       |  CAST(260 AS BIGINT) AS n_samples, st.abs_sum, st.peak,
       |  lpad(hex(hs.afp), 16, '0') AS afp_hex
       |FROM a JOIN st USING (asset_id) JOIN hs USING (asset_id)
       |ORDER BY a.asset_id""".stripMargin

  private def mmAudioDedupOracle: String = {
    // the [[mmPhashOracle]] multi-probe wide-recall gate on the afp hash
    val bandEq = (0 until 4).map(b =>
      s"bit_count(xor((l.afp >> ${b * 16}) & 65535, (r.afp >> ${b * 16}) & 65535)) <= 1")
      .mkString("\n      OR ")
    s"""WITH ${mmAudioCtes(
        """SELECT pid, pid AS asset_id, 16 AS bits, 1 AS gain, 0 AS noisy,
          |    0 AS mute FROM ids
          |  UNION ALL SELECT pid, pid + 1000000, 16, 2, 0, 0 FROM ids
          |  UNION ALL SELECT pid, pid + 2000000, 16, 1, 1, 0 FROM ids""".stripMargin)},
       |cl AS (
       |  SELECT afp, min(asset_id) AS rep, count(*) AS clique
       |  FROM hs GROUP BY afp),
       |pairs AS (
       |  SELECT l.rep AS a, r.rep AS b,
       |    CAST(bit_count(xor(l.afp, r.afp)) AS INT) AS hamming,
       |    l.clique AS clique_a, r.clique AS clique_b
       |  FROM cl l JOIN cl r ON l.rep < r.rep
       |    AND ($bandEq))
       |SELECT a, b, hamming, clique_a, clique_b FROM pairs
       |WHERE hamming <= 7 ORDER BY a, b""".stripMargin
  }

  /** Shared CTEs for the REAL video-demux oracles: regenerate every
    * frame's 8x8 raw-DIB pixels from the id arithmetic (frame f of video
    * v carries pixel id `v*131 + f*17` under the [[mmPixelCtes]] cell
    * formula; `noisy` bumps frames `f%5 == 0`), apply the identical
    * integer luma map, and fold each frame's 9x8 nearest-grid dHash. At
    * size 8 the cell map is the identity (`xx = (8i)//9`, `yy = j`), so
    * the grid reads pixel arithmetic directly. Junk payloads never
    * appear: the demux DROPS undecodable bytes.
    */
  private def mmVideoCtes(variants: String,
      pidExpr: String = "vid * 131 + f * 17"): String = {
    val pow2 = (0 until 64).map(p => (BigInt(1) << p).toString)
      .mkString("[", ", ", "]")
    val bump =
      """CASE WHEN noisy = 1 AND (f % 5) = 0 AND xx = 1 AND yy = 2 THEN 40
        |      WHEN noisy = 1 AND (f % 5) = 0 AND xx = 5 AND yy = 6 THEN 60
        |      ELSE 0 END""".stripMargin
    def lumaOf(src: String) =
      s"""(299 * ((base * 7 + 23) % 256) + 587 * ((base * 3 + 11) % 256)
         |      + 114 * (base % 256)) // 1000 AS luma FROM $src""".stripMargin
    s"""ids AS (SELECT doc_id AS vid FROM documents WHERE doc_id < 300),
       |a AS ($variants),
       |fr AS (SELECT asset_id, vid, noisy,
       |  unnest(generate_series(0, 9)) AS f FROM a),
       |px AS (SELECT asset_id, vid, noisy, f,
       |  unnest(generate_series(0, 63)) AS p FROM fr),
       |pc AS (SELECT asset_id, f,
       |    (p % 8) AS xx, (p // 8) AS yy, $pidExpr AS pid, noisy
       |  FROM px),
       |basep AS (SELECT asset_id, f,
       |    pid * 31 + yy * 19 + xx * 7 + $bump AS base
       |  FROM pc),
       |lum AS (SELECT asset_id, f,
       |    ${lumaOf("basep")}),
       |gp AS (SELECT asset_id, vid, noisy, f,
       |  unnest(generate_series(0, 71)) AS g FROM fr),
       |gc AS (SELECT asset_id, f, (g % 9) AS i, (g // 9) AS j,
       |    ((g % 9) * 8) // 9 AS xx, (g // 9) AS yy,
       |    $pidExpr AS pid, noisy
       |  FROM gp),
       |gb AS (SELECT asset_id, f, i, j,
       |    pid * 31 + yy * 19 + xx * 7 + $bump AS base
       |  FROM gc),
       |gl AS (SELECT asset_id, f, i, j,
       |    ${lumaOf("gb")}),
       |fbits AS (
       |  SELECT l.asset_id, l.f, l.j * 8 + l.i AS bp,
       |    CASE WHEN l.luma > r.luma THEN 1 ELSE 0 END AS bit
       |  FROM gl l JOIN gl r
       |    ON l.asset_id = r.asset_id AND l.f = r.f AND l.j = r.j
       |    AND r.i = l.i + 1
       |  WHERE l.i < 8),
       |fhs AS (
       |  SELECT asset_id, f,
       |    CAST(SUM(CASE WHEN bit = 1 THEN ($pow2::UBIGINT[])[bp + 1]
       |             ELSE 0::UBIGINT END) AS UBIGINT) AS dh
       |  FROM fbits GROUP BY 1, 2)""".stripMargin
  }

  private def mmVideoDemuxOracle: String =
    s"""WITH ${mmVideoCtes(
        """SELECT vid, vid AS asset_id, 0 AS noisy FROM ids
          |  UNION ALL SELECT vid, vid + 1000000, 1 FROM ids""".stripMargin)},
       |st AS (
       |  SELECT asset_id, f, CAST(SUM(luma) AS BIGINT) AS gray_sum
       |  FROM lum GROUP BY 1, 2)
       |SELECT st.asset_id, CAST(st.f AS INT) AS frame_id, 8 AS width,
       |  8 AS height, st.gray_sum, lpad(hex(fhs.dh), 16, '0') AS dhash_hex
       |FROM st JOIN fhs ON st.asset_id = fhs.asset_id AND st.f = fhs.f
       |ORDER BY st.asset_id, frame_id""".stripMargin

  private def mmVideoDedupOracle: String =
    // collapse-first on the ORDERED frame-hash sequence (the operator's
    // clique-safe default): byte-identical copies share the sequence
    // and fold to (rep = min id, clique = count) before the frame join
    s"""WITH ${mmVideoCtes(
        """SELECT vid, vid AS asset_id, 0 AS noisy FROM ids
          |  UNION ALL SELECT vid, vid + 1000000, 0 FROM ids
          |  UNION ALL SELECT vid, vid + 2000000, 1 FROM ids""".stripMargin)},
       |seqs AS (
       |  SELECT asset_id, list(dh ORDER BY f) AS sig
       |  FROM fhs GROUP BY asset_id),
       |cl AS (
       |  SELECT min(asset_id) AS rep, count(*) AS clique
       |  FROM seqs GROUP BY sig),
       |rf AS (
       |  SELECT c.rep, c.clique, h.f, h.dh
       |  FROM cl c JOIN fhs h ON h.asset_id = c.rep),
       |pairs AS (
       |  SELECT l.rep AS a, r.rep AS b,
       |    CAST(count(*) AS BIGINT) AS n_matched,
       |    max(l.clique) AS clique_a, max(r.clique) AS clique_b
       |  FROM rf l JOIN rf r
       |    ON l.rep < r.rep AND l.f = r.f
       |  WHERE bit_count(xor(l.dh, r.dh)) <= 6
       |  GROUP BY 1, 2)
       |SELECT a, b, n_matched, CAST(10 AS BIGINT) AS n_a,
       |  CAST(10 AS BIGINT) AS n_b, clique_a, clique_b
       |FROM pairs WHERE n_matched * 100 >= 80 * 10 ORDER BY a, b""".stripMargin

  private def mmVideoScenesOracle: String =
    s"""WITH ${mmVideoCtes(
        "SELECT vid, vid AS asset_id, 0 AS noisy FROM ids",
        pidExpr = "vid * 131 + (f // 4) * 17")},
       |lagd AS (
       |  SELECT asset_id, f, dh,
       |    LAG(dh) OVER (PARTITION BY asset_id ORDER BY f) AS pdh
       |  FROM fhs)
       |SELECT asset_id, CAST(f AS INT) AS frame_id,
       |  CAST(CASE WHEN pdh IS NULL THEN NULL
       |    ELSE bit_count(xor(dh, pdh)) END AS INT) AS hamming_prev,
       |  (pdh IS NULL OR bit_count(xor(dh, pdh)) > 2) AS is_cut
       |FROM lagd ORDER BY asset_id, frame_id""".stripMargin

  private def mmAudioSegmentsOracle: String =
    s"""WITH ${mmAudioCtes(
        """SELECT pid, pid AS asset_id, 16 AS bits, 1 AS gain, 0 AS noisy,
          |    1 AS mute FROM ids""".stripMargin)},
       |tot AS (SELECT asset_id, SUM(e) AS total FROM e GROUP BY 1),
       |sil AS (
       |  SELECT e.asset_id, j, e,
       |    (e * 65 * 100 < 25 * total) AS silent
       |  FROM e JOIN tot USING (asset_id)),
       |op AS (
       |  SELECT asset_id, j, e, silent,
       |    CASE WHEN NOT silent AND coalesce(
       |        LAG(silent) OVER (PARTITION BY asset_id ORDER BY j), true)
       |      THEN 1 ELSE 0 END AS opens
       |  FROM sil),
       |sg AS (
       |  SELECT asset_id, j, e, silent,
       |    SUM(opens) OVER (PARTITION BY asset_id ORDER BY j
       |      ROWS UNBOUNDED PRECEDING) AS seg
       |  FROM op)
       |SELECT asset_id, CAST(seg AS BIGINT) AS seg_id,
       |  CAST(MIN(j) AS INT) AS start_window,
       |  CAST(MAX(j) AS INT) AS end_window,
       |  count(*) AS n_windows_seg, CAST(SUM(e) AS BIGINT) AS energy_sum
       |FROM sg WHERE NOT silent GROUP BY 1, 2
       |ORDER BY asset_id, seg_id""".stripMargin

  /** mm_frames: recompute the demuxer-stub byte windows (offset_i =
    * len*i/4, window ends at offset_{i+1}) and their exact integer byte
    * sums from the hex dump — same nibble-lookup trick as
    * [[mmFeaturesOracle]].
    */
  private def mmFramesOracle: String = {
    val nib = "strpos('0123456789ABCDEF', %s) - 1"
    val hi = nib.format("substr(h, 2*CAST(j AS INT) + 1, 1)")
    val lo = nib.format("substr(h, 2*CAST(j AS INT) + 2, 1)")
    s"""WITH ${assetBytesCte("len")},
       |f AS (
       |  SELECT asset_id, len, h, CAST(i AS INT) AS frame_id,
       |    len * i // 4 AS o, len * (i + 1) // 4 AS e
       |  FROM b, UNNEST(range(0, 4)) AS t(i))
       |SELECT asset_id, frame_id, o AS "offset", e - o AS frame_len,
       |  CAST(coalesce(list_sum(list_transform(range(o, e),
       |    j -> ($hi) * 16 + ($lo))), 0) AS BIGINT) AS frame_sum
       |FROM f ORDER BY asset_id, frame_id""".stripMargin
  }

  /** text_bpe_train oracle: unfold [[graft.operators.TextAnalysis
    * .bpeTrain]]'s driver loop into `n` nested CTE stages. Each stage
    * recomputes the weighted pair counts from the enclosed-symbol
    * encoding (`␁s1␁␁s2␁…`), picks the same argmax (ties by pair
    * string), and applies the identical non-regex `replace` merge.
    */
  // shared CTE builders for the bpe oracles ------------------------------

  /** The chosen pair `pK`'s enclosed-pattern / merged-replacement pair. */
  private def bpePat(step: Int): (String, String) = (
    s"chr(1)||string_split((SELECT pr FROM p$step), chr(1))[1]||chr(1)||" +
      s"chr(1)||string_split((SELECT pr FROM p$step), chr(1))[2]||chr(1)",
    s"chr(1)||replace((SELECT pr FROM p$step), chr(1), '')||chr(1)")

  /** WITH-stage stack shared by the bpe train/apply oracles: tokenize,
    * vocab, enc0 encoding, then n rounds of argmax pick + merge (the
    * final merge only when `mergeLast`).
    */
  private def bpeStages(n: Int, mergeLast: Boolean): String = {
    def pick(step: Int, src: String) =
      s"""p$step AS (
         |  SELECT pr, CAST(sum(c) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(sy)),
         |      i -> sy[i] || chr(1) || sy[i+1])) AS pr, c
         |    FROM (SELECT c, string_split(substr(sym, 2, length(sym)-2),
         |      chr(1)||chr(1)) AS sy FROM $src))
         |  GROUP BY pr ORDER BY cnt DESC, pr LIMIT 1)""".stripMargin
    def merge(step: Int, src: String) = {
      val (pat, rep) = bpePat(step)
      s"""enc$step AS (
         |  SELECT c, replace(sym, $pat, $rep) AS sym
         |  FROM $src)""".stripMargin
    }
    val stages = (1 to n).flatMap { i =>
      val src = s"enc${i - 1}"
      Seq(pick(i, src)) ++
        (if (i < n || mergeLast) Seq(merge(i, src)) else Nil)
    }
    s"""$bpeHeader,
       |${stages.mkString(",\n")}""".stripMargin
  }

  /** Shared tokenize → vocab → enclosed-symbol-encoding CTE header of
    * every bpe oracle (no trailing comma).
    */
  private def bpeHeader: String =
    s"""tok AS (
       |  SELECT unnest(string_split(
       |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents),
       |vocab AS (SELECT w, count(*) AS c FROM tok
       |  WHERE length(w) >= 1 GROUP BY w),
       |enc0 AS (SELECT c, list_aggregate(list_transform(
       |    string_split(w, ''), ch -> chr(1)||ch||chr(1)),
       |    'string_agg', '') AS sym FROM vocab)""".stripMargin

  private def bpeTrainOracle(n: Int): String = {
    val unions = (1 to n).map { i =>
      s"""SELECT $i AS step, string_split(pr, chr(1))[1] AS lhs,
         |  string_split(pr, chr(1))[2] AS rhs, cnt FROM p$i""".stripMargin
    }
    s"""WITH ${bpeStages(n, mergeLast = false)}
       |${unions.mkString("\nUNION ALL\n")}
       |ORDER BY step""".stripMargin
  }

  /** text_bpe_train_deep oracle: replay of [[graft.operators.TextAnalysis
    * .bpeTrain]]'s BATCHED selection. Per round: one pair recount
    * (materialized, LIMIT batch*8 candidates by cnt desc / pr), then
    * `batch` pick CTEs — pick k is the argmax among candidates whose two
    * symbols are DISJOINT from every earlier pick of the round (its lhs,
    * rhs, AND concatenation lhs||rhs; an empty pick NULL-poisons the
    * comparisons of all later picks, which is exactly greedy
    * exhaustion) — then ONE merge stage applying the
    * picks' replaces in pick order (empty picks coalesce to a chr(2)
    * no-op pattern). Steps renumber by (round, pick) at the end.
    */
  private def bpeTrainBatchedOracle(nMerges: Int, batch: Int): String = {
    val k = batch * 8
    val nRounds = (nMerges + batch - 1) / batch
    def picksIn(r: Int) = math.min(batch, nMerges - (r - 1) * batch)
    def pick(r: Int, j: Int) = s"p${r}_$j"
    val stages = (1 to nRounds).flatMap { r =>
      val src = s"enc${r - 1}"
      val cand =
        s"""cand$r AS MATERIALIZED (
           |  SELECT pr, cnt, string_split(pr, chr(1))[1] AS lhs,
           |    string_split(pr, chr(1))[2] AS rhs
           |  FROM (
           |    SELECT pr, CAST(sum(c) AS BIGINT) AS cnt FROM (
           |      SELECT unnest(list_transform(range(1, len(sy)),
           |        i -> sy[i] || chr(1) || sy[i+1])) AS pr, c
           |      FROM (SELECT c, string_split(substr(sym, 2, length(sym)-2),
           |        chr(1)||chr(1)) AS sy FROM $src))
           |    GROUP BY pr ORDER BY cnt DESC, pr LIMIT $k))""".stripMargin
      val picks = (1 to picksIn(r)).map { j =>
        val disjoint = (1 until j).map { i =>
          val p = pick(r, i)
          // third exclusion term (lhs||rhs): a candidate whose symbol
          // equals an earlier pick's CONCATENATION would merge
          // occurrences that pick's replace just created — counts not
          // in this round's recount (mirrors bpeTrain's used += a+b)
          s"""lhs <> (SELECT lhs FROM $p) AND lhs <> (SELECT rhs FROM $p)
             |    AND rhs <> (SELECT lhs FROM $p) AND rhs <> (SELECT rhs FROM $p)
             |    AND lhs <> (SELECT lhs||rhs FROM $p)
             |    AND rhs <> (SELECT lhs||rhs FROM $p)""".stripMargin
        }
        val where =
          if (disjoint.isEmpty) "" else disjoint.mkString("\n  WHERE ", "\n    AND ", "")
        s"""${pick(r, j)} AS MATERIALIZED (
           |  SELECT pr, cnt, lhs, rhs FROM cand$r$where
           |  ORDER BY cnt DESC, pr LIMIT 1)""".stripMargin
      }
      val merged = (1 to picksIn(r)).foldLeft("sym") { (acc, j) =>
        val p = pick(r, j)
        val pat = s"coalesce(chr(1)||(SELECT lhs FROM $p)||chr(1)||" +
          s"chr(1)||(SELECT rhs FROM $p)||chr(1), chr(2))"
        val rep = s"coalesce(chr(1)||(SELECT lhs FROM $p)||" +
          s"(SELECT rhs FROM $p)||chr(1), '')"
        s"replace($acc, $pat, $rep)"
      }
      // MATERIALIZED is load-bearing on enc/pick: each enc$r is referenced
      // twice (cand$r+1 and enc$r+1) — inlined, the plan doubles per round
      // (2^nRounds expansion; observed: 50 GB for 8 rounds at sf0.01)
      val enc = s"""enc$r AS MATERIALIZED (SELECT c, $merged AS sym FROM $src)"""
      cand +: picks :+ enc
    }
    val unions = (1 to nRounds).flatMap { r =>
      (1 to picksIn(r)).map { j =>
        s"SELECT $r AS r, $j AS k, lhs, rhs, cnt FROM ${pick(r, j)}"
      }
    }
    s"""WITH $bpeHeader,
       |${stages.mkString(",\n")}
       |SELECT CAST(row_number() OVER (ORDER BY r, k) AS INTEGER) AS step,
       |  lhs, rhs, cnt
       |FROM (
       |${unions.mkString("\nUNION ALL\n")}
       |)
       |ORDER BY step""".stripMargin
  }

  /** text_bpe_encode oracle: re-derive the same n merges, then apply them
    * in step order to every document's enclosed-symbol encoding (token
    * boundaries are spaces, so the patterns cannot straddle tokens) and
    * count pieces by symbol-marker arithmetic — the SQL twin of
    * [[graft.operators.TextAnalysis.bpeApply]].
    */
  private def bpeApplyOracle(n: Int): String = {
    val docStages = (1 to n).map { i =>
      val (pat, rep) = bpePat(i)
      s"""doc$i AS (
         |  SELECT doc_id, n_tokens, replace(sym, $pat, $rep) AS sym
         |  FROM doc${i - 1})""".stripMargin
    }
    s"""WITH ${bpeStages(n, mergeLast = false)},
       |doc0 AS (
       |  SELECT doc_id, len(string_split(canon, ' ')) AS n_tokens,
       |    list_aggregate(list_transform(string_split(canon, ' '), t ->
       |      CASE WHEN t = '' THEN '' ELSE
       |        list_aggregate(list_transform(string_split(t, ''),
       |          ch -> chr(1)||ch||chr(1)), 'string_agg', '') END),
       |      'string_agg', ' ') AS sym
       |  FROM (SELECT doc_id,
       |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g') AS canon
       |    FROM documents)),
       |${docStages.mkString(",\n")}
       |SELECT doc_id, n_tokens,
       |  (length(sym) - length(replace(sym, chr(1), ''))) // 2 AS n_pieces
       |FROM doc$n ORDER BY doc_id""".stripMargin
  }

  /** mm_resize: recompute the strided-byte thumbnail (stride =
    * ceil(len/64), samples at range(0, len, stride)) and its exact
    * sampled-byte sum from the hex dump.
    */
  private def mmResizeOracle: String = {
    val nib = "strpos('0123456789ABCDEF', %s) - 1"
    val hi = nib.format("substr(h, 2*CAST(j AS INT) + 1, 1)")
    val lo = nib.format("substr(h, 2*CAST(j AS INT) + 2, 1)")
    s"""WITH ${assetBytesCte("byte_len")},
       |s AS (
       |  SELECT asset_id, byte_len, h,
       |    CASE WHEN byte_len = 0 THEN 1
       |         ELSE (byte_len + 63) // 64 END AS stride
       |  FROM b)
       |SELECT asset_id, byte_len, stride,
       |  len(range(0, byte_len, stride)) AS thumb_len,
       |  CAST(coalesce(list_sum(list_transform(range(0, byte_len, stride),
       |    j -> ($hi) * 16 + ($lo))), 0) AS BIGINT) AS thumb_sum
       |FROM s ORDER BY asset_id""".stripMargin
  }

  /** SemDeDup recomputation: re-trains the identical 16 centroids over
    * the planted-twin corpus (hash-sampled seeds + one Lloyd step, as in
    * [[ivfOracle]]), assigns cells, emits within-cell cosine pairs and
    * closes them into components with a recursive transitive closure.
    */
  private def semdedupOracle: String = {
    val meanCols = (0 until 64).map(d => s"round(avg(v[${d + 1}]), 3) AS m$d")
      .mkString(",\n    ")
    val centList = (0 until 64).map(d => s"coalesce(m.m$d, round(s.v[${d + 1}], 3))")
      .mkString("[", ", ", "]")
    val hSigned = "(md5_number_lower(CAST(vec_id AS VARCHAR))::HUGEINT - " +
      "CASE WHEN md5_number_lower(CAST(vec_id AS VARCHAR)) >= 9223372036854775808 " +
      "THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
    s"""WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(v, x -> x + 0.05) AS v FROM base),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY $hSigned, vec_id) - 1 AS cell, v
       |  FROM e
       |  ORDER BY $hSigned, vec_id LIMIT 16),
       |a0 AS (
       |  SELECT e.vec_id, e.v, s.cell,
       |    list_dot_product(e.v, s.v) / sqrt(list_dot_product(s.v, s.v)) AS score
       |  FROM e CROSS JOIN seeds s),
       |b0 AS (
       |  SELECT vec_id, v, cell FROM a0
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |m AS (SELECT cell,
       |    $meanCols
       |  FROM b0 GROUP BY cell),
       |cent AS (
       |  SELECT s.cell, $centList AS cv
       |  FROM seeds s LEFT JOIN m ON s.cell = m.cell),
       |ac AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |    list_dot_product(e.v, c.cv) / sqrt(list_dot_product(c.cv, c.cv)) AS score
       |  FROM e CROSS JOIN cent c),
       |cellof AS (
       |  SELECT vec_id, v, cell FROM ac
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) = 1),
       |pr AS (
       |  SELECT l.vec_id AS a, r.vec_id AS b, l.v AS qv, r.v AS cv
       |  FROM cellof l JOIN cellof r ON l.cell = r.cell AND l.vec_id < r.vec_id),
       |p AS (
       |  SELECT a, b FROM (SELECT a, b, $cosExpr AS cos0 FROM pr)
       |  WHERE cos0 >= 0.75),
       |und AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT u, u FROM und
       |  UNION
       |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |ids AS (SELECT vec_id AS id FROM e)
       |SELECT i.id, coalesce(comp.component, i.id) AS component,
       |  i.id = coalesce(comp.component, i.id) AS keep
       |FROM ids i LEFT JOIN comp ON i.id = comp.id
       |ORDER BY i.id""".stripMargin
  }

  /** BM25 recomputation: identical literal-scan term frequencies (the
    * replace-length trick), one stats row, the same fixed-order float
    * arithmetic (constants embedded as the exact runtime doubles).
    */
  private def bm25Oracle(terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    def tf(tm: String) =
      s"CAST((length(' ' || t || ' ') - length(replace(' ' || t || ' ', ' $tm ', ''))) // ${tm.length + 2} AS BIGINT)"
    val tfCols = terms.zipWithIndex.map { case (tm, i) => s"${tf(tm)} AS tf$i" }
      .mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n    ")
    val avgdl = "(CAST(tl AS DOUBLE) / CAST(n AS DOUBLE))"
    val score = terms.indices.map { i =>
      val tfD = s"CAST(tf$i AS DOUBLE)"
      val dfD = s"CAST(df$i AS DOUBLE)"
      s"ln(1.0 + (CAST(n AS DOUBLE) - $dfD + 0.5) / ($dfD + 0.5)) * " +
        s"($tfD * ${k1 + 1.0}) / ($tfD + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / $avgdl))"
    }.mkString("\n    + ")
    s"""WITH c AS (
       |  SELECT doc_id AS id,
       |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |tfs AS (
       |  SELECT id, t,
       |    CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS dl,
       |    $tfCols
       |  FROM c),
       |stats AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS tl,
       |    $dfCols
       |  FROM tfs),
       |scored AS (
       |  SELECT id,
       |    $score AS score
       |  FROM tfs CROSS JOIN stats),
       |topk AS (
       |  SELECT id, score FROM scored WHERE score > 0
       |  ORDER BY score DESC, id LIMIT $k)
       |SELECT id, round(score, 6) AS score FROM topk ORDER BY id""".stripMargin
  }

  /** RRF hybrid-search oracle: the BM25 pool CTEs (same arithmetic as
    * [[bm25Oracle]]), the dense cosine pool (same arithmetic as the
    * brute-force oracle), reciprocal-rank fusion with the identical
    * two-term sum order.
    */
  private def hybridOracle(terms: Seq[String], queryVecId: Long, k: Int,
      poolK: Int, kRrf: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    def tf(tm: String) =
      s"CAST((length(' ' || t || ' ') - length(replace(' ' || t || ' ', ' $tm ', ''))) // ${tm.length + 2} AS BIGINT)"
    val tfCols = terms.zipWithIndex.map { case (tm, i) => s"${tf(tm)} AS tf$i" }
      .mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n    ")
    val avgdl = "(CAST(tl AS DOUBLE) / CAST(n AS DOUBLE))"
    val score = terms.indices.map { i =>
      val tfD = s"CAST(tf$i AS DOUBLE)"
      val dfD = s"CAST(df$i AS DOUBLE)"
      s"ln(1.0 + (CAST(n AS DOUBLE) - $dfD + 0.5) / ($dfD + 0.5)) * " +
        s"($tfD * ${k1 + 1.0}) / ($tfD + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / $avgdl))"
    }.mkString("\n    + ")
    s"""WITH c AS (
       |  SELECT doc_id AS id,
       |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |tfs AS (
       |  SELECT id, t,
       |    CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS dl,
       |    $tfCols
       |  FROM c),
       |stats AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS tl,
       |    $dfCols
       |  FROM tfs),
       |lexscored AS (
       |  SELECT id,
       |    $score AS score
       |  FROM tfs CROSS JOIN stats),
       |lexpool AS (
       |  SELECT id, score FROM lexscored WHERE score > 0
       |  ORDER BY score DESC, id LIMIT $poolK),
       |lex AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS lex_rank
       |  FROM lexpool),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dscored AS (
       |  SELECT cv.vec_id AS id,
       |    list_dot_product(q.v, cv.v) /
       |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos0
       |  FROM e q JOIN e cv ON q.vec_id = $queryVecId AND cv.vec_id != q.vec_id),
       |dense AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY cos0 DESC, id) AS INT) AS dense_rank
       |  FROM dscored QUALIFY dense_rank <= $poolK),
       |fused AS (
       |  SELECT coalesce(l.id, d.id) AS doc_id, l.lex_rank, d.dense_rank,
       |    coalesce(1.0 / ($kRrf + l.lex_rank), 0.0)
       |      + coalesce(1.0 / ($kRrf + d.dense_rank), 0.0) AS rrf
       |  FROM lex l FULL JOIN dense d ON l.id = d.id),
       |topk AS (
       |  SELECT doc_id, lex_rank, dense_rank, rrf FROM fused
       |  ORDER BY rrf DESC, doc_id LIMIT $k)
       |SELECT doc_id, lex_rank, dense_rank, round(rrf, 6) AS rrf,
       |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
       |FROM topk ORDER BY doc_id""".stripMargin
  }

  /** Streaming-retention replay oracle: per batch b, every user with an
    * event in b's range gets the anchor-gated flags recomputed over ALL
    * events up to b's upper bound.
    */
  private def retentionReplayOracle: String = {
    val anchor = "event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'"
    val c1 = "ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'"
    val c2 = "ts >= TIMESTAMP '2024-01-15 00:00:00'"
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""out$b AS (
         |  SELECT $b AS batch, user_id,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END) AS INT) AS r0,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |      * max(CASE WHEN $c1 THEN 1 ELSE 0 END) AS INT) AS r1,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |      * max(CASE WHEN $c2 THEN 1 ELSE 0 END) AS INT) AS r2
         |  FROM events
         |  WHERE ($upTo) AND user_id IN (
         |    SELECT DISTINCT user_id FROM events WHERE $inBatch)
         |  GROUP BY user_id)"""
    }
    s"""WITH
       |${blocks.mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, user_id""".stripMargin
  }

  /** Streaming-funnel replay oracle: per batch b, the users with step
    * events in b's event-time range get the BATCH funnel level over the
    * full history up to b's upper bound — the equivalence the standing
    * state maintains.
    */
  private def funnelReplayOracle: String = {
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""e$b AS (SELECT * FROM ev WHERE $upTo),
         |u$b AS (SELECT DISTINCT user_id FROM ev WHERE $inBatch),
         |l1_$b AS (SELECT DISTINCT user_id FROM e$b WHERE event_type = 'view'),
         |l2_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM e$b a JOIN e$b b ON a.user_id = b.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND),
         |l3_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM e$b a JOIN e$b b ON a.user_id = b.user_id
         |    JOIN e$b c ON a.user_id = c.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND c.event_type = 'purchase'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
         |    AND c.ts >= b.ts AND c.ts <= a.ts + INTERVAL 14400 SECOND),
         |out$b AS (
         |  SELECT $b AS batch, u.user_id,
         |    CASE WHEN l3.user_id IS NOT NULL THEN 3
         |         WHEN l2.user_id IS NOT NULL THEN 2
         |         WHEN l1.user_id IS NOT NULL THEN 1
         |         ELSE 0 END AS level
         |  FROM u$b u LEFT JOIN l1_$b l1 ON u.user_id = l1.user_id
         |    LEFT JOIN l2_$b l2 ON u.user_id = l2.user_id
         |    LEFT JOIN l3_$b l3 ON u.user_id = l3.user_id)"""
    }
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_type FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |${blocks.mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, user_id""".stripMargin
  }

  /** Streaming-uniqHLL replay oracle: per batch b, the full uniqHLL
    * pipeline (the q_uniq_hll recipe) over events visible up to b's
    * bound, restricted to the event types touched in b — the estimate
    * the standing register state must reproduce exactly.
    */
  private def streamingUniqHllOracle: String = {
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""h$b AS (
         |  SELECT event_type,
         |    CAST(md5_number_lower(CAST(user_id AS VARCHAR)) >> 4 AS BIGINT) AS h
         |  FROM events WHERE ($upTo) AND event_type IN (
         |    SELECT DISTINCT event_type FROM events WHERE $inBatch)),
         |r$b AS (
         |  SELECT event_type, h % 512 AS reg,
         |    LEAST(CASE WHEN h // 512 = 0 THEN 52
         |          ELSE 52 - length(bin(h // 512)) END, 30) AS rho
         |  FROM h$b),
         |m$b AS (SELECT event_type, reg, max(rho) AS m FROM r$b GROUP BY 1, 2),
         |s$b AS (
         |  SELECT event_type,
         |    sum(CAST(1 AS BIGINT) << (30 - m)) AS s_present,
         |    count(*) AS n_regs
         |  FROM m$b GROUP BY 1),
         |x$b AS (
         |  SELECT event_type, n_regs, 512 - n_regs AS v0,
         |    202600935058957.5 / CAST(
         |      s_present + (512 - n_regs) * (CAST(1 AS BIGINT) << 30)
         |      AS DOUBLE) AS raw
         |  FROM s$b),
         |out$b AS (
         |  SELECT $b AS batch, event_type,
         |    CAST(CASE WHEN v0 > 0 AND raw <= 1280.0
         |      THEN floor(512.0 * ln(512.0 / v0) + 0.5)
         |      ELSE floor(raw) END AS BIGINT) AS est,
         |    n_regs
         |  FROM x$b)"""
    }
    s"""WITH
       |${blocks.mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, event_type""".stripMargin
  }

  /** Streaming-KMV replay oracle: per batch b, the q_kmv_distinct
    * recipe over events visible up to b's bound, restricted to the
    * event types touched in b — the estimate the standing min-k state
    * must reproduce exactly (the fold is idempotent min-k, so the
    * oracle needs no newest-row discipline).
    */
  private def streamingKmvOracle: String = {
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""h$b AS (
         |  SELECT DISTINCT event_type,
         |    md5_number_lower(CAST(event_id AS VARCHAR))::HUGEINT AS h
         |  FROM events WHERE ($upTo) AND event_type IN (
         |    SELECT DISTINCT event_type FROM events WHERE $inBatch)),
         |r$b AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n_d
         |  FROM h$b),
         |out$b AS (
         |  SELECT $b AS batch, event_type,
         |    CAST(CASE WHEN n_d < 256 THEN n_d
         |      ELSE floor(4703919738795935662080.0 / CAST(h AS DOUBLE))
         |      END AS BIGINT) AS est,
         |    CAST(least(n_d, 256) AS INT) AS n_kept
         |  FROM r$b WHERE rn = least(n_d, 256))"""
    }
    s"""WITH
       |${blocks.mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, event_type""".stripMargin
  }

  /** Analytics-capstone replay oracle: the funnel and retention replay
    * recipes composed — per batch, the funnel block's touched users
    * FULL OUTER JOIN the retention block's on user_id. The restart
    * between batches 0 and 1 is invisible to the oracle by design: a
    * correct recovery produces exactly the same per-batch views.
    */
  private def analyticsReplayOracle: String = {
    val anchor = "event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'"
    val c1 = "ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'"
    val c2 = "ts >= TIMESTAMP '2024-01-15 00:00:00'"
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""e$b AS (SELECT * FROM ev WHERE $upTo),
         |u$b AS (SELECT DISTINCT user_id FROM ev WHERE $inBatch),
         |l1_$b AS (SELECT DISTINCT user_id FROM e$b WHERE event_type = 'view'),
         |l2_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM e$b a JOIN e$b b ON a.user_id = b.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND),
         |l3_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM e$b a JOIN e$b b ON a.user_id = b.user_id
         |    JOIN e$b c ON a.user_id = c.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND c.event_type = 'purchase'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
         |    AND c.ts >= b.ts AND c.ts <= a.ts + INTERVAL 14400 SECOND),
         |fout$b AS (
         |  SELECT u.user_id,
         |    CASE WHEN l3.user_id IS NOT NULL THEN 3
         |         WHEN l2.user_id IS NOT NULL THEN 2
         |         WHEN l1.user_id IS NOT NULL THEN 1
         |         ELSE 0 END AS level
         |  FROM u$b u LEFT JOIN l1_$b l1 ON u.user_id = l1.user_id
         |    LEFT JOIN l2_$b l2 ON u.user_id = l2.user_id
         |    LEFT JOIN l3_$b l3 ON u.user_id = l3.user_id),
         |rout$b AS (
         |  SELECT user_id,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END) AS INT) AS r0,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |      * max(CASE WHEN $c1 THEN 1 ELSE 0 END) AS INT) AS r1,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |      * max(CASE WHEN $c2 THEN 1 ELSE 0 END) AS INT) AS r2
         |  FROM events
         |  WHERE ($upTo) AND user_id IN (
         |    SELECT DISTINCT user_id FROM events WHERE $inBatch)
         |  GROUP BY user_id),
         |out$b AS (
         |  SELECT $b AS batch, coalesce(f.user_id, r.user_id) AS user_id,
         |    f.level, r.r0, r.r1, r.r2
         |  FROM fout$b f FULL OUTER JOIN rout$b r ON f.user_id = r.user_id)"""
    }
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_type FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |${blocks.mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, user_id""".stripMargin
  }

  /** Greedy non-overlapping sequence-automaton replay (linear recursive
    * CTE), shared by the DataFrame operator row (`q_sequence_count`)
    * and its SQL-aggregate twin (`q_sequence_count_sql`).
    */
  private val sequenceCountWalkOracle: String =
      """WITH RECURSIVE ev0 AS (
        |  SELECT user_id,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |      ELSE 2 END AS s, ts
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |ev AS (
        |  SELECT user_id, s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, s) AS rn
        |  FROM ev0),
        |n AS (SELECT user_id, max(rn) AS n FROM ev GROUP BY 1),
        |walk AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS level, 0 AS cnt
        |  FROM n
        |  UNION ALL
        |  SELECT w.user_id, w.rn + 1,
        |    CASE WHEN e.s = w.level THEN
        |      CASE WHEN w.level = 2 THEN 0 ELSE w.level + 1 END
        |    ELSE w.level END,
        |    w.cnt + CASE WHEN e.s = 2 AND w.level = 2 THEN 1 ELSE 0 END
        |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
        |SELECT w.user_id, CAST(w.cnt AS INT) AS n_matches
        |FROM walk w JOIN n ON w.user_id = n.user_id AND w.rn = n.n
        |ORDER BY w.user_id""".stripMargin

  /** Anchor-gated retention-flag replay, shared by the DataFrame
    * operator row (`q_retention`) and its SQL-aggregate twin
    * (`q_retention_sql`).
    */
  private val retentionFlagsOracle: String =
      """SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'signup'
        |      AND ts < TIMESTAMP '2024-01-08 00:00:00' THEN 1 ELSE 0 END)
        |    AS INT) AS r0,
        |  CAST(max(CASE WHEN event_type = 'signup'
        |      AND ts < TIMESTAMP '2024-01-08 00:00:00' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END)
        |    AS INT) AS r1,
        |  CAST(max(CASE WHEN event_type = 'signup'
        |      AND ts < TIMESTAMP '2024-01-08 00:00:00' THEN 1 ELSE 0 END)
        |    * max(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
        |      THEN 1 ELSE 0 END) AS INT) AS r2
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exists-chain funnel replay, shared by the DataFrame-operator row
    * (`q_window_funnel`) and its SQL-aggregate twin
    * (`q_window_funnel_sql`).
    */
  private val windowFunnelExistsOracle: String =
      """WITH ev AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |l1 AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
        |l2 AS (
        |  SELECT DISTINCT a.user_id
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |  WHERE a.event_type = 'view' AND b.event_type = 'click'
        |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND),
        |l3 AS (
        |  SELECT DISTINCT a.user_id
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    JOIN ev c ON a.user_id = c.user_id
        |  WHERE a.event_type = 'view' AND b.event_type = 'click'
        |    AND c.event_type = 'purchase'
        |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
        |    AND c.ts >= b.ts AND c.ts <= a.ts + INTERVAL 14400 SECOND)
        |SELECT u.user_id,
        |  CASE WHEN l3.user_id IS NOT NULL THEN 3
        |       WHEN l2.user_id IS NOT NULL THEN 2
        |       WHEN l1.user_id IS NOT NULL THEN 1
        |       ELSE 0 END AS level
        |FROM u LEFT JOIN l1 ON u.user_id = l1.user_id
        |  LEFT JOIN l2 ON u.user_id = l2.user_id
        |  LEFT JOIN l3 ON u.user_id = l3.user_id
        |ORDER BY u.user_id""".stripMargin

  /** Literal replay of [[graft.operators.EventAnalytics.funnelWalk]] for
    * the positional interrupt modes (strict_dedup / strict_order): per
    * chain start (each step-0 event), a recursive CTE advances one
    * (ts, step)-sorted event at a time carrying (level, cut) — exactly
    * the walk's state — and the user's funnel level is the max over all
    * of their starts. `cutExpr` is the mode's interrupt condition over
    * the incoming event `e` and walk state `w` (evaluated only when the
    * event is inside the window and does not advance the chain).
    */
  private def funnelWalkOracle(cutExpr: String, plant: String = ""): String =
    s"""WITH RECURSIVE ev0 AS (
       |  SELECT user_id AS u, epoch_us(ts) AS t,
       |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
       |      ELSE 2 END AS s
       |  FROM events WHERE event_type IN ('view', 'click', 'purchase')$plant),
       |ev AS (
       |  SELECT u, t, s,
       |    row_number() OVER (PARTITION BY u ORDER BY t, s) AS rn
       |  FROM ev0),
       |walk AS (
       |  SELECT u, rn AS rn0, rn AS j, 1 AS level,
       |    t + 14400000000 AS dl, false AS cut
       |  FROM ev WHERE s = 0
       |  UNION ALL
       |  SELECT w.u, w.rn0, e.rn,
       |    CASE WHEN e.t <= w.dl AND e.s = w.level
       |      THEN w.level + 1 ELSE w.level END,
       |    w.dl,
       |    CASE WHEN e.t > w.dl THEN true
       |         WHEN e.s = w.level THEN false
       |         ELSE ($cutExpr) END
       |  FROM walk w JOIN ev e ON e.u = w.u AND e.rn = w.j + 1
       |  WHERE NOT w.cut AND w.level < 3),
       |best AS (SELECT u, max(level) AS level FROM walk GROUP BY u)
       |SELECT e.u AS user_id, coalesce(b.level, 0) AS level
       |FROM (SELECT DISTINCT u FROM ev) e LEFT JOIN best b ON e.u = b.u
       |ORDER BY user_id""".stripMargin

  /** Multi-tier capstone replay oracle: the funnel, retention, uniqHLL,
    * quantile-sketch, and summing replay recipes composed into one tall
    * (batch, tier, k, v1, v2) frame — per batch, each tier's
    * full-history view for the keys that batch touched. The cold
    * restart and compaction between batches 0 and 1 are invisible to
    * the oracle by design: correct recovery reproduces the same views.
    */
  private def multitierReplayOracle: String = {
    val anchor = "event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'"
    val c1 = "ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'"
    val c2 = "ts >= TIMESTAMP '2024-01-15 00:00:00'"
    val bounds = Seq(
      ("0", "ts < TIMESTAMP '2024-01-11 00:00:00'",
        "ts < TIMESTAMP '2024-01-11 00:00:00'"),
      ("1", "ts >= TIMESTAMP '2024-01-11 00:00:00' AND ts < TIMESTAMP '2024-01-21 00:00:00'",
        "ts < TIMESTAMP '2024-01-21 00:00:00'"),
      ("2", "ts >= TIMESTAMP '2024-01-21 00:00:00'", "TRUE"))
    val blocks = bounds.map { case (b, inBatch, upTo) =>
      s"""fe$b AS (SELECT * FROM fev WHERE $upTo),
         |fu$b AS (SELECT DISTINCT user_id FROM fev WHERE $inBatch),
         |fl1_$b AS (SELECT DISTINCT user_id FROM fe$b WHERE event_type = 'view'),
         |fl2_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM fe$b a JOIN fe$b b ON a.user_id = b.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND),
         |fl3_$b AS (
         |  SELECT DISTINCT a.user_id
         |  FROM fe$b a JOIN fe$b b ON a.user_id = b.user_id
         |    JOIN fe$b c ON a.user_id = c.user_id
         |  WHERE a.event_type = 'view' AND b.event_type = 'click'
         |    AND c.event_type = 'purchase'
         |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
         |    AND c.ts >= b.ts AND c.ts <= a.ts + INTERVAL 14400 SECOND),
         |fout$b AS (
         |  SELECT 'funnel' AS tier, CAST(u.user_id AS VARCHAR) AS k,
         |    CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
         |         WHEN l2.user_id IS NOT NULL THEN 2
         |         WHEN l1.user_id IS NOT NULL THEN 1
         |         ELSE 0 END AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
         |  FROM fu$b u LEFT JOIN fl1_$b l1 ON u.user_id = l1.user_id
         |    LEFT JOIN fl2_$b l2 ON u.user_id = l2.user_id
         |    LEFT JOIN fl3_$b l3 ON u.user_id = l3.user_id),
         |rout$b AS (
         |  SELECT 'retention' AS tier, CAST(user_id AS VARCHAR) AS k,
         |    CAST(max(CASE WHEN $anchor THEN 1 ELSE 0 END) * 4
         |      + max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |        * max(CASE WHEN $c1 THEN 1 ELSE 0 END) * 2
         |      + max(CASE WHEN $anchor THEN 1 ELSE 0 END)
         |        * max(CASE WHEN $c2 THEN 1 ELSE 0 END) AS DOUBLE) AS v1,
         |    CAST(NULL AS DOUBLE) AS v2
         |  FROM events
         |  WHERE ($upTo) AND user_id IN (
         |    SELECT DISTINCT user_id FROM events WHERE $inBatch)
         |  GROUP BY user_id),
         |hh$b AS (
         |  SELECT event_type,
         |    CAST(md5_number_lower(CAST(user_id AS VARCHAR)) >> 4 AS BIGINT) AS h
         |  FROM events WHERE ($upTo) AND event_type IN (
         |    SELECT DISTINCT event_type FROM events WHERE $inBatch)),
         |hr$b AS (
         |  SELECT event_type, h % 512 AS reg,
         |    LEAST(CASE WHEN h // 512 = 0 THEN 52
         |          ELSE 52 - length(bin(h // 512)) END, 30) AS rho
         |  FROM hh$b),
         |hm$b AS (SELECT event_type, reg, max(rho) AS m FROM hr$b GROUP BY 1, 2),
         |hs$b AS (
         |  SELECT event_type,
         |    sum(CAST(1 AS BIGINT) << (30 - m)) AS s_present,
         |    count(*) AS n_regs
         |  FROM hm$b GROUP BY 1),
         |hout$b AS (
         |  SELECT 'uniq' AS tier, event_type AS k,
         |    CAST(CAST(CASE WHEN 512 - n_regs > 0 AND raw <= 1280.0
         |      THEN floor(512.0 * ln(512.0 / (512 - n_regs)) + 0.5)
         |      ELSE floor(raw) END AS BIGINT) AS DOUBLE) AS v1,
         |    CAST(n_regs AS DOUBLE) AS v2
         |  FROM (SELECT event_type, n_regs,
         |    202600935058957.5 / CAST(
         |      s_present + (512 - n_regs) * (CAST(1 AS BIGINT) << 30)
         |      AS DOUBLE) AS raw FROM hs$b)),
         |qv$b AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
         |  FROM events WHERE ($upTo) AND event_type IN (
         |    SELECT DISTINCT event_type FROM events WHERE $inBatch)),
         |qh$b AS (
         |  SELECT event_type, (s >> w) << w AS blo, count(*) AS cnt
         |  FROM (SELECT event_type, s,
         |    GREATEST(length(bin(s)) - 8, 0) AS w FROM qv$b) GROUP BY 1, 2),
         |qc$b AS (
         |  SELECT event_type, blo, cnt,
         |    sum(cnt) OVER (PARTITION BY event_type ORDER BY blo) AS cum,
         |    sum(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM qh$b),
         |qout$b AS (
         |  SELECT 'quantile' AS tier, event_type AS k,
         |    CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN blo END)
         |      AS DOUBLE) / CAST(100 AS DOUBLE) AS v1,
         |    CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN blo END)
         |      AS DOUBLE) / CAST(100 AS DOUBLE) AS v2
         |  FROM qc$b GROUP BY event_type),
         |sout$b AS (
         |  SELECT 'summing' AS tier, CAST(user_id % 10 AS VARCHAR) AS k,
         |    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS v1,
         |    CAST(NULL AS DOUBLE) AS v2
         |  FROM events
         |  WHERE ($upTo) AND user_id % 10 IN (
         |    SELECT DISTINCT user_id % 10 FROM events WHERE $inBatch)
         |  GROUP BY user_id % 10),
         |out$b AS (
         |  SELECT $b AS batch, * FROM (
         |    SELECT * FROM fout$b UNION ALL SELECT * FROM rout$b
         |    UNION ALL SELECT * FROM hout$b UNION ALL SELECT * FROM qout$b
         |    UNION ALL SELECT * FROM sout$b))"""
    }
    s"""WITH fev AS (
       |  SELECT user_id, ts, event_type FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |${blocks.mkString(",\n")}
       |SELECT batch, tier, k, v1, v2 FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, tier, k""".stripMargin
  }

  /** Standing-CDC replay oracle: all updates stamped with their batch id
    * (seed = -1), then per batch b the current/previous state for b's
    * key set recomputed with batch-bounded visibility — `cur` folds
    * `b' <= b`, `prev` folds `b' < b`, exactly the view
    * [[graft.streaming.StreamingReplacingMerge.admit]] maintains.
    */
  private def cdcReplayOracle: String = {
    def out(b: Int): String =
      s"""cur$b AS (
         |  SELECT k, ver, status, tp FROM (
         |    SELECT k, ver, status, tp,
         |      row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
         |    FROM upd WHERE b <= $b
         |      AND k IN (SELECT k FROM upd WHERE b = $b)) WHERE rn = 1),
         |prev$b AS (
         |  SELECT k, ver FROM (
         |    SELECT k, ver,
         |      row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
         |    FROM upd WHERE b < $b
         |      AND k IN (SELECT k FROM upd WHERE b = $b)) WHERE rn = 1),
         |out$b AS (
         |  SELECT $b AS batch, c.k, c.ver, c.status,
         |    round(c.tp, 6) AS totalprice, p.ver AS prev_ver,
         |    (p.ver IS NULL OR c.ver != p.ver) AS changed
         |  FROM cur$b c LEFT JOIN prev$b p ON c.k = p.k)"""
    s"""WITH ks AS (SELECT DISTINCT o_orderkey % 300 AS k FROM orders),
       |upd AS (
       |  SELECT o_orderkey % 300 AS k, o_orderkey AS ver,
       |    o_orderstatus AS status, o_totalprice AS tp, -1 AS b FROM orders
       |  UNION ALL
       |  SELECT k, k + 1000000, 'U0', CAST(k AS DOUBLE) * 1.5, 0
       |  FROM ks WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT k, k + 2000000, 'U1', CAST(k AS DOUBLE) * 2.5, 1
       |  FROM ks WHERE k % 4 = 0
       |  UNION ALL
       |  SELECT k, k + 1000, 'U2', CAST(k AS DOUBLE) * 3.5, 2
       |  FROM ks WHERE k % 5 = 0),
       |${(0 to 2).map(out).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT * FROM out0 UNION ALL
       |  SELECT * FROM out1 UNION ALL
       |  SELECT * FROM out2)
       |ORDER BY batch, k""".stripMargin
  }

  /** Integer-PageRank oracle: the 5 update rounds unrolled as CTEs (the
    * [[graft.operators.TextAnalysis.bpeTrain]] oracle recipe) — every
    * operation is BIGINT multiplication / integer division, so both
    * engines produce identical ranks regardless of summation order.
    */
  private def pageRankOracle(iters: Int): String = {
    val scale = "1000000000000"
    def round(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nd.node,
         |    (SELECT b FROM base) + (coalesce(c.s, 0) * 85) // 100 AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.deg) AS s
         |    FROM e JOIN deg d ON e.src = d.src JOIN $prev r ON e.src = r.node
         |    GROUP BY 1) c ON nd.node = c.node)"""
    }
    s"""WITH e AS (
       |  SELECT DISTINCT l_orderkey % 500 AS src,
       |    CAST(l_partkey AS BIGINT) % 500 AS dst
       |  FROM lineitem),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |st AS (SELECT count(*) AS n FROM nodes),
       |base AS (SELECT (($scale * 15) // 100) // n AS b FROM st),
       |r0 AS (SELECT node, $scale // n AS rank FROM nodes, st),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT node, CAST(rank AS BIGINT) AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keeper, COUNT(*) AS n
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_ngram_jaccard" -> {
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 100
         |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
         |    text || ' zzdup zzmarker zztoken' AS text
         |  FROM documents WHERE doc_id < 100),
         |${shinglesCtes("corpus")}
         |SELECT sa.doc_id AS a, sb.doc_id AS b,
         |  round($jaccardExpr, 6) AS jaccard
         |FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
         |WHERE $jaccardExpr >= 0.05
         |ORDER BY a, b""".stripMargin
    },

    "dedup_drop_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT doc_id FROM (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |  FROM corpus)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_ngram_containment" -> {
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 100
         |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string(string_split(text, ' ')[1:10], ' ') AS text
         |  FROM documents WHERE doc_id < 100),
         |${shinglesCtes("corpus")}
         |SELECT sa.doc_id AS a, sb.doc_id AS b,
         |  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |    / len(sa.s), 6) AS containment
         |FROM sh sa JOIN sh sb ON sa.doc_id != sb.doc_id
         |WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
         |    / len(sa.s) >= 0.6
         |ORDER BY a, b""".stripMargin
    },

    // integer double-and-fold Luhn over leftmost non-overlapping runs
    "text_pii_cards" ->
      """WITH corpus AS (
        |  SELECT doc_id, text || CASE WHEN doc_id % 2 = 0
        |    THEN ' card 4539578763621486 ref 1234567890123'
        |    ELSE ' acct 79927398713999 ord 4111111111111111' END AS text
        |  FROM documents WHERE doc_id < 200),
        |cand AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text, '[0-9]{13,19}')) AS candidate
        |  FROM corpus)
        |SELECT doc_id, candidate,
        |  list_sum(list_transform(range(1, length(candidate) + 1), i ->
        |    CASE WHEN (length(candidate) - i) % 2 = 1
        |      THEN CASE WHEN CAST(candidate[i] AS INT) * 2 > 9
        |        THEN CAST(candidate[i] AS INT) * 2 - 9
        |        ELSE CAST(candidate[i] AS INT) * 2 END
        |      ELSE CAST(candidate[i] AS INT) END)) % 10 = 0 AS valid
        |FROM cand ORDER BY doc_id, candidate""".stripMargin,

    // identical fixed-order float arithmetic on both engines
    "text_readability" ->
      """SELECT doc_id,
        |  length(regexp_replace(text, '\s+', '', 'g')) AS n_chars_ns,
        |  CASE WHEN trim(text) = '' THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |  greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1) AS n_sentences,
        |  CASE WHEN (CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END) > 0 THEN
        |    CAST(floor((4.71 * (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |        / (CASE WHEN trim(text) = '' THEN 0
        |           ELSE len(string_split_regex(trim(text), '\s+')) END))
        |      + 0.5 * (CAST((CASE WHEN trim(text) = '' THEN 0
        |           ELSE len(string_split_regex(trim(text), '\s+')) END) AS DOUBLE)
        |        / greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1))
        |      - 21.43) * 1000000 + 0.5) AS BIGINT)
        |  END AS ari_q
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_minhash_lsh" -> minhashOracle,

    "dedup_minhash_incr" -> minhashIncrOracle,

    "stream_dedup_replay" -> streamReplayOracle,

    "stream_phash_replay" -> streamPhashReplayOracle,

    // global first occurrence per canonical paragraph fp, ordered
    // (batch, id, pos) with the seed at batch -1 — exactly the state the
    // standing filter accumulates; output = batches >= 0 reassembled
    "stream_paradedup_replay" -> {
      // every embedded line must END with its || (a line STARTING with
      // || would lose one pipe to the outer stripMargin)
      val batchArms = (0 until 3).map { k =>
        s"  UNION ALL SELECT $k AS batch, doc_id + ${k + 1}000000 AS doc_id,\n" +
          "    'shared boilerplate paragraph on every doc' || chr(10) || text ||\n" +
          "    chr(10) || 'tail ' || CAST(doc_id AS VARCHAR) || ' v' ||\n" +
          s"    CAST(CASE WHEN doc_id % 2 = 0 THEN $k ELSE ${k % 2} END AS VARCHAR) AS text\n" +
          "  FROM base"
      }.mkString("\n")
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         |docs AS (
         |  SELECT -1 AS batch, doc_id,
         |    'shared boilerplate paragraph on every doc' || chr(10) || text
         |      || chr(10) || 'seed tail ' || CAST(doc_id AS VARCHAR) AS text
         |  FROM base
         |$batchArms),
         |p AS (
         |  SELECT batch, doc_id, CAST(i AS INT) - 1 AS pos,
         |    paras[CAST(i AS INT)] AS para
         |  FROM (SELECT batch, doc_id, string_split_regex(text, '\\n+') AS paras
         |        FROM docs),
         |       UNNEST(generate_series(1, len(paras))) AS g(i)
         |  WHERE trim(paras[CAST(i AS INT)]) != ''),
         |k AS (
         |  SELECT batch, doc_id, pos, para,
         |    row_number() OVER (
         |      PARTITION BY md5(regexp_replace(replace(replace(lower(trim(para)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'))
         |      ORDER BY batch, doc_id, pos) AS rn
         |  FROM p)
         |SELECT batch, doc_id AS id, count(*) AS n_paras_kept,
         |  string_agg(para, chr(10) ORDER BY pos) AS text_dedup
         |FROM k WHERE rn = 1 AND batch >= 0 GROUP BY batch, doc_id
         |ORDER BY batch, id""".stripMargin
    },

    // streaming decontamination replay: state at batch 0 is the seed
    // benchmark's gram set alone; batches 2+ gate against the UNION with
    // the release folded in at id 1 — the verdict flip on %4==3 docs
    // between batch 0 and batch 2 is the state-accumulation proof
    "stream_decontaminate_replay" -> {
      val words8 =
        "string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')"
      def sh8(w: String) = s"""CASE WHEN len($w) < 8 THEN [array_to_string($w, ' ')]
        |    ELSE list_transform(range(1, len($w) - 6),
        |           i -> array_to_string($w[i:i+7], ' ')) END""".stripMargin
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |w0 AS (SELECT doc_id, $words8 AS words FROM d),
         |b0g AS (SELECT DISTINCT unnest(list_distinct(${sh8("words")})) AS sg
         |  FROM w0 WHERE doc_id < 20),
         |b1g AS (SELECT DISTINCT unnest(list_distinct(${sh8("words")})) AS sg
         |  FROM w0 WHERE doc_id >= 20 AND doc_id < 40),
         |spans0 AS (SELECT doc_id % 20 AS bid,
         |    array_to_string(words[1:8], ' ') AS span
         |  FROM w0 WHERE doc_id < 20),
         |spans1 AS (SELECT doc_id % 20 AS bid,
         |    array_to_string(words[1:8], ' ') AS span
         |  FROM w0 WHERE doc_id >= 20 AND doc_id < 40),
         |base AS (SELECT doc_id, text FROM d WHERE doc_id % 5 = 0),
         |raw AS (
         |  SELECT doc_id, text FROM base WHERE doc_id % 2 = 0
         |  UNION ALL SELECT b.doc_id, b.text || ' ' || s.span
         |    FROM base b JOIN spans0 s ON b.doc_id % 20 = s.bid
         |    WHERE b.doc_id % 4 = 1
         |  UNION ALL SELECT b.doc_id, b.text || ' ' || s.span
         |    FROM base b JOIN spans1 s ON b.doc_id % 20 = s.bid
         |    WHERE b.doc_id % 4 = 3),
         |batches AS (
         |  SELECT 0 AS batch, doc_id + 1000000 AS id, text FROM raw
         |  UNION ALL SELECT 2, doc_id + 2000000, text FROM raw
         |  UNION ALL SELECT 3, doc_id + 3000000, text FROM raw),
         |bw AS (SELECT batch, id, $words8 AS words FROM batches),
         |g AS (SELECT batch, id,
         |    unnest(list_distinct(${sh8("words")})) AS sg FROM bw),
         |agg AS (
         |  SELECT batch, id, count(*) AS n_grams,
         |    CAST(SUM(CASE WHEN sg IN (SELECT sg FROM b0g)
         |        OR (batch >= 2 AND sg IN (SELECT sg FROM b1g))
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM g GROUP BY 1, 2)
         |SELECT batch, id, n_grams, n_hits, n_hits > 0 AS contaminated
         |FROM agg ORDER BY batch, id""".stripMargin
    },

    "stream_embdedup_replay" -> streamEmbReplayOracle,

    "stream_semdedup_replay" -> streamSemReplayOracle,

    "text_decontaminate_fuzzy" -> decontaminateFuzzyOracle,

    "dedup_cluster_minhash" -> minhashClusterOracle,

    "dedup_simhash" -> simhashOracle,

    // replay of the standing exact-substring state: per batch, the TRUE
    // 40-char-window join of that batch against the seed corpus plus
    // every earlier batch (seed = batch -1; state reads are strictly
    // before the admitted id)
    "stream_substring_replay" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |base AS (SELECT doc_id, text FROM d WHERE doc_id % 5 = 0),
         |spans AS (SELECT doc_id % 20 AS bid, substr(text, 1, 60) AS span
         |  FROM d WHERE doc_id < 20),
         |ks AS (SELECT unnest([0, 1, 2]) AS k),
         |batches AS (
         |  SELECT ks.k AS batch, b.doc_id + (ks.k + 1) * 1000000 AS doc_id,
         |    CASE WHEN b.doc_id % 4 = 1
         |      THEN b.text || ' b' || CAST(ks.k AS VARCHAR) || ' ' || s.span
         |      ELSE b.text || ' b' || CAST(ks.k AS VARCHAR) END AS text
         |  FROM base b CROSS JOIN ks
         |  LEFT JOIN spans s ON b.doc_id % 4 = 1 AND s.bid = b.doc_id % 20),
         |everything AS (
         |  SELECT -1 AS batch, doc_id, text FROM base
         |  UNION ALL SELECT batch, doc_id, text FROM batches),
         |g AS (SELECT batch, doc_id, unnest(list_transform(
         |    range(1, greatest(length(text) - 38, 1)),
         |    i -> substr(text, i::INT, 40))) AS gm FROM everything),
         |gd AS (SELECT DISTINCT batch, doc_id, gm FROM g)
         |SELECT DISTINCT n.batch AS batch, r.doc_id AS ref_id,
         |  n.doc_id AS new_id
         |FROM gd r JOIN gd n ON r.gm = n.gm AND r.batch < n.batch
         |WHERE n.batch >= 0
         |ORDER BY batch, ref_id, new_id""".stripMargin,

    // identical counts, ln/ln(2) to mirror the expression's arithmetic;
    // double divergence is ~1e-15, far inside the 6-decimal compare
    "text_entropy" ->
      s"""WITH ch AS (SELECT doc_id, unnest(list_transform(
         |    range(1, length(text) + 1),
         |    i -> substr(text, i::INT, 1))) AS c FROM documents),
         |f AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
         |  FROM ch GROUP BY doc_id, c),
         |t AS (SELECT doc_id, sum(n) AS tot FROM f GROUP BY doc_id)
         |SELECT f.doc_id,
         |  round(-sum((n / t.tot) * ln(n / t.tot) / ln(2)), 6) AS entropy
         |FROM f JOIN t ON f.doc_id = t.doc_id
         |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,

    // the TRUE <=2-edit-distance join: deletion-neighborhood banding +
    // levenshtein verify reproduce it exactly
    "text_fuzzy_join" ->
      s"""WITH d AS (SELECT doc_id, lower(substr(text, 1, 16)) AS k
         |  FROM documents WHERE doc_id < 200),
         |m1 AS (SELECT doc_id + 1000000 AS doc_id,
         |  substr(k, 1, 3) || 'q' || substr(k, 5) AS k FROM d WHERE doc_id < 50),
         |m2 AS (SELECT doc_id + 2000000 AS doc_id,
         |  substr(k, 1, 8) || substr(k, 10) AS k FROM d WHERE doc_id < 50),
         |c AS (SELECT * FROM d UNION ALL SELECT * FROM m1
         |  UNION ALL SELECT * FROM m2)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(levenshtein(a.k, b.k) AS INT) AS dist
         |FROM c a JOIN c b
         |  ON a.doc_id < b.doc_id AND levenshtein(a.k, b.k) <= 2
         |ORDER BY a, b""".stripMargin,

    // the TRUE 40-char-window join: rolling-hash banding + witness
    // verification reproduce it exactly
    "dedup_substring_exact" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |spans AS (SELECT doc_id AS bid, substr(text, 1, 60) AS span
         |  FROM d WHERE doc_id < 20),
         |planted AS (
         |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || s.span AS text
         |  FROM d JOIN spans s ON d.doc_id % 20 = s.bid
         |  WHERE d.doc_id >= 100 AND d.doc_id < 200),
         |corpus AS (SELECT doc_id, text FROM d
         |  UNION ALL SELECT doc_id, text FROM planted),
         |g AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(length(text) - 38, 1)),
         |    i -> substr(text, i::INT, 40))) AS gm FROM corpus),
         |gd AS (SELECT DISTINCT doc_id, gm FROM g)
         |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |FROM gd a JOIN gd b ON a.gm = b.gm AND a.doc_id < b.doc_id
         |ORDER BY a, b""".stripMargin,

    // exact replay of the winnowed selection: prefix rolling hashes
    // P(i) = P(i-1)*B1 + cp(i) mod 2^64 via a recursive CTE (HUGEINT
    // carries the mod-2^64 arithmetic; 11429019619962296993 = B1^40 mod
    // 2^64, and the split multiply keeps P*B1^40 inside HUGEINT), gram
    // hash h1(p) = P(p+40) - P(p)*B1^40, then the rightmost-unsigned-min
    // champion of each 10-gram window via a window-min over the
    // composite key h1*2^32 + (2^32-1-pos). Verified pairs reduce to
    // "share a selected gram by content" (the Spark side's witness
    // verification makes 128-bit hash collisions unobservable), so the
    // final join is on the literal 40-char gram.
    "dedup_substring_winnow" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents),
        |spans AS (SELECT doc_id AS bid, substr(text, 1, 60) AS span
        |  FROM d WHERE doc_id < 20),
        |planted AS (
        |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || s.span AS text
        |  FROM d JOIN spans s ON d.doc_id % 20 = s.bid
        |  WHERE d.doc_id >= 100 AND d.doc_id < 200),
        |corpus AS (SELECT doc_id, text FROM d
        |  UNION ALL SELECT doc_id, text FROM planted),
        |doc AS (SELECT doc_id, text, length(text) AS n FROM corpus
        |  WHERE length(text) >= 40),
        |pref AS (
        |  SELECT doc_id, text, n, 0 AS i, 0::HUGEINT AS p1
        |  FROM doc
        |  UNION ALL
        |  SELECT doc_id, text, n, i + 1,
        |    (p1 * 1099511628211::HUGEINT
        |     + unicode(substr(text, i + 1, 1))::HUGEINT)
        |      % 18446744073709551616::HUGEINT
        |  FROM pref WHERE i < n),
        |g AS (
        |  SELECT a.doc_id, a.i AS p0,
        |    (b.p1
        |     - ((a.p1 % 4294967296::HUGEINT) * 11429019619962296993::HUGEINT
        |        + ((a.p1 // 4294967296::HUGEINT) * 11429019619962296993::HUGEINT
        |           % 4294967296::HUGEINT) * 4294967296::HUGEINT)
        |       % 18446744073709551616::HUGEINT
        |     + 18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT AS h1u
        |  FROM pref a JOIN pref b
        |    ON a.doc_id = b.doc_id AND b.i = a.i + 40),
        |mk AS (
        |  SELECT doc_id, p0,
        |    min(h1u * 4294967296::HUGEINT + (4294967295 - p0)::HUGEINT)
        |      OVER (PARTITION BY doc_id ORDER BY p0
        |            ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS minkey,
        |    count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM g),
        |sel AS (
        |  SELECT DISTINCT doc_id,
        |    4294967295 - CAST(minkey % 4294967296::HUGEINT AS BIGINT) AS champ
        |  FROM mk WHERE p0 <= greatest(ng - 10, 0)),
        |sg AS (
        |  SELECT s.doc_id, substr(c.text, s.champ::INT + 1, 40) AS gram
        |  FROM sel s JOIN corpus c ON s.doc_id = c.doc_id)
        |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |FROM sg a JOIN sg b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |ORDER BY a, b""".stripMargin,

    "dedup_simhash_wide" -> simhashWideOracle,

    "dedup_embedding" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(v, x -> x + 0.05) AS v FROM base)
        |SELECT q.vec_id AS a, c.vec_id AS b,
        |  round(list_dot_product(q.v, c.v) /
        |        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |FROM e q JOIN e c ON q.vec_id < c.vec_id
        |WHERE q.vec_id < 50
        |  AND list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) >= 0.75
        |ORDER BY a, b""".stripMargin,

    "dedup_embedding_lsh" -> embeddingLshOracle,

    "dedup_embedding_incr" -> embeddingIncrOracle,

    "sim_topk_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos0
        |  FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id != q.vec_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
        |  nn_id, round(cos0, 6) AS cos
        |FROM scored QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 20.0) AS BIGINT) AS bin,
        |  count(*) AS n, round(min(value), 6) AS lo,
        |  round(max(value), 6) AS hi
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    "sample_weighted" ->
      """SELECT doc_id FROM documents
        |WHERE CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 1) % 10000 AS DOUBLE)
        |  < least(CAST(n_chars AS DOUBLE) / 2000.0, 1.0) * 10000
        |ORDER BY doc_id""".stripMargin,

    // the brute-force oracle with the cosine band applied before ranking
    "sim_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos0
        |  FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id != q.vec_id),
        |banded AS (
        |  SELECT * FROM scored WHERE cos0 >= 0.3 AND cos0 < 0.9)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos0 DESC, nn_id) AS INT) AS rank,
        |  nn_id, round(cos0, 6) AS cos
        |FROM banded QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // exact-dup families are cliques on the fingerprint, so the cluster
    // is min(doc_id) per fp; the split hashes the COMPONENT id
    "sample_split_safe" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g')) AS f
        |  FROM corpus),
        |comp AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS component
        |  FROM fp),
        |sp AS (
        |  SELECT doc_id, component,
        |    (md5_number_lower(CAST(component AS VARCHAR)) >> 1) % 10000 AS bkt
        |  FROM comp)
        |SELECT doc_id, component,
        |  CASE WHEN bkt < 8000 THEN 'train'
        |       WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM sp ORDER BY doc_id""".stripMargin,

    "sim_topk_lsh" -> lshOracle,

    "sim_topk_ivf" -> ivfOracle,

    "sim_topk_pq" -> pqOracle,

    // the indexed twins answer from the SAVED + RELOADED index; training
    // is deterministic, so the oracle recomputation is the same SQL —
    // and the persisted-inverted-list twin reads identical rows from
    // the cell-partitioned files, so it shares it too
    "sim_topk_ivf_indexed" -> ivfOracle,

    "sim_topk_ivf_persisted" -> ivfOracle,

    // append-after-save answers == rebuild-on-union under frozen
    // centroids (trained on the even half, assignment over the union)
    "sim_topk_ivf_appended" -> ivfAppendedOracle,

    "sim_topk_pq_indexed" -> pqOracle,

    "sim_topk_ivfpq" -> ivfPqOracle,

    // append-after-save answers == rebuild-on-union under the frozen
    // even-half-trained centroids AND codebooks
    "sim_topk_ivfpq_appended" -> ivfPqAppendedOracle,

    "text_langid" -> {
      def hits(lang: String, words: Seq[String]): String = words.map { w =>
        s"CAST((length(' ' || replace(replace(lower(text), 'ς', 'σ'), 'i' || chr(775), 'i') || ' ') - length(replace(' ' || replace(replace(lower(text), 'ς', 'σ'), 'i' || chr(775), 'i') || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      val de = hits("de", Seq("der", "die", "und", "ist", "das"))
      val en = hits("en", Seq("the", "and", "is", "of", "to"))
      val es = hits("es", Seq("el", "la", "los", "es", "y"))
      val fr = hits("fr", Seq("le", "la", "les", "est", "et"))
      val zh = hits("zh", Seq("的", "是", "了", "在", "我"))
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    $de AS sde, $en AS sen, $es AS ses, $fr AS sfr, $zh AS szh
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN GREATEST(sde, sen, ses, sfr, szh) = 0 THEN 'und'
         |       WHEN sde = GREATEST(sde, sen, ses, sfr, szh) THEN 'de'
         |       WHEN sen = GREATEST(sde, sen, ses, sfr, szh) THEN 'en'
         |       WHEN ses = GREATEST(sde, sen, ses, sfr, szh) THEN 'es'
         |       WHEN sfr = GREATEST(sde, sen, ses, sfr, szh) THEN 'fr'
         |       ELSE 'zh' END AS predicted
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // identical strip/decode chain: blocks+comments, tags, named
    // entities, numeric references (marker-split + chr() map with the
    // same bounded-length/valid-scalar guards as DecodeNumericEntities),
    // amp LAST, whitespace collapse
    "text_strip_html" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><style>p { color: red; }</style><script>if (x < 2) { alert("hi"); }</script></head><body><h1>Doc '
        |      || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
        |      || '</p><!-- hidden comment --><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;caf&#233; h&#xE9;llo &#X41;&#0233; gr&#128512; bad&#12345678; sur&#55296; no&#x; esc&#38;lt; amp&amp;#65; end</p></body></html>' AS h
        |  FROM documents WHERE doc_id < 500),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(h,
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g') AS b
        |  FROM page),
        |t AS (SELECT doc_id, regexp_replace(b, '<[^>]+>', ' ', 'g') AS b FROM c),
        |e AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(b,
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', chr(39), 'g'), '&apos;', chr(39), 'g'),
        |      '&nbsp;', ' ', 'g') AS b
        |  FROM t),
        |m AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(b,
        |      '&#([xX][0-9a-fA-F]{1,6});', chr(1) || '\1' || chr(1), 'g'),
        |      '&#([0-9]{1,7});', chr(1) || 'd\1' || chr(1), 'g') AS b
        |  FROM e),
        |tok AS (SELECT doc_id, unnest(string_split(b, chr(1))) AS s,
        |    generate_subscripts(string_split(b, chr(1)), 1) AS i
        |  FROM m),
        |dec AS (SELECT doc_id, i,
        |    CASE WHEN i % 2 = 0 THEN
        |      CASE WHEN CASE WHEN s LIKE 'd%' THEN try_cast(substr(s, 2) AS INTEGER)
        |                     ELSE try_cast('0x' || substr(s, 2) AS INTEGER) END
        |                BETWEEN 1 AND 1114111
        |            AND NOT (CASE WHEN s LIKE 'd%' THEN try_cast(substr(s, 2) AS INTEGER)
        |                     ELSE try_cast('0x' || substr(s, 2) AS INTEGER) END
        |                BETWEEN 55296 AND 57343)
        |           THEN chr(CASE WHEN s LIKE 'd%' THEN try_cast(substr(s, 2) AS INTEGER)
        |                     ELSE try_cast('0x' || substr(s, 2) AS INTEGER) END)
        |           WHEN s LIKE 'd%' THEN '&#' || substr(s, 2) || ';'
        |           ELSE '&#' || s || ';' END
        |      ELSE s END AS o
        |  FROM tok),
        |g AS (SELECT doc_id, string_agg(o, '' ORDER BY i) AS b FROM dec GROUP BY doc_id)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(b, '&amp;', '&', 'g'), '\s+', ' ', 'g')) AS clean
        |FROM g ORDER BY doc_id""".stripMargin,

    // script counts share the exact range literals with the Spark side
    // (TextAnalysis.scriptRanges — explicit BMP blocks, not version-
    // dependent \p{script} classes)
    "text_scripts" -> {
      val rangeCols = TextAnalysis.scriptRanges.map { case (n, r) =>
        s"length(regexp_replace(text, '[^$r]', '', 'g')) AS c_$n"
      }.mkString(",\n    ")
      val sumListed = TextAnalysis.scriptRanges.map(p => s"c_${p._1}")
        .mkString(" + ")
      val ratioCols = TextAnalysis.scriptRanges.map { case (n, _) =>
        s"round(CASE WHEN ns = 0 THEN 0.0 ELSE CAST(c_$n AS DOUBLE) / ns END, 6) AS $n"
      }.mkString(",\n  ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text ||
         |    CASE doc_id % 4 WHEN 0 THEN ' αβγ' WHEN 1 THEN ' привет'
         |         WHEN 2 THEN ' مرحبا' ELSE '' END AS text
         |  FROM documents WHERE doc_id < 500),
         |c AS (
         |  SELECT doc_id,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS ns,
         |    $rangeCols
         |  FROM corpus)
         |SELECT doc_id,
         |  $ratioCols,
         |  round(CASE WHEN ns = 0 THEN 0.0
         |    ELSE CAST(ns - ($sumListed) AS DOUBLE) / ns END, 6) AS other
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "text_quality" -> {
      val stopHits = TextAnalysis.enStopwords.map { w =>
        s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    $stopHits AS stop_hits,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS praw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_pieces,
         |  round(CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS alpha_ratio,
         |  round(praw, 6) AS punct_ratio,
         |  round(CASE WHEN n_tokens = 0 THEN 0.0
         |    ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_tokens END, 6) AS mean_token_len,
         |  stop_hits,
         |  round(LEAST(n_tokens / 20.0, 1.0) * 0.4
         |      + LEAST(stop_hits / 3.0, 1.0) * 0.3
         |      + GREATEST(0.0, 1.0 - praw * 5.0) * 0.3, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(CASE WHEN n_words = 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END, 6) AS dup_ratio,
        |  round(CASE WHEN n_words = 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END, 6) < 0.8 AS keep
        |FROM t ORDER BY doc_id""".stripMargin,

    // snapshot diff: both snapshots reduced to (id, md5) then a full
    // outer join — byte-level change classification
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
        |        ELSE text END) AS new_fp
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5('new ' || text)
        |  FROM documents WHERE doc_id % 11 = 0),
        |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_fp, new_fp
        |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT doc_id,
        |  CASE WHEN old_fp IS NULL THEN 'added'
        |       WHEN new_fp IS NULL THEN 'removed'
        |       WHEN old_fp = new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_fp, new_fp
        |FROM j ORDER BY doc_id""".stripMargin,

    "corpus_curate" -> {
      val stopHits = TextAnalysis.enStopwords.map { w =>
        s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      def hits(words: Seq[String]): String = words.map { w =>
        s"CAST((length(' ' || replace(replace(lower(text), 'ς', 'σ'), 'i' || chr(775), 'i') || ' ') - length(replace(' ' || replace(replace(lower(text), 'ς', 'σ'), 'i' || chr(775), 'i') || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      val de = hits(Seq("der", "die", "und", "ist", "das"))
      val en = hits(Seq("the", "and", "is", "of", "to"))
      val es = hits(Seq("el", "la", "los", "es", "y"))
      val fr = hits(Seq("le", "la", "les", "est", "et"))
      val zh = hits(Seq("的", "是", "了", "在", "我"))
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |dedup AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM corpus)
         |  WHERE rn = 1),
         |t AS (
         |  SELECT doc_id, text,
         |    CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    $stopHits AS stop_hits,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END AS praw
         |  FROM dedup),
         |q AS (
         |  SELECT doc_id, text,
         |    round(LEAST(n_tokens / 20.0, 1.0) * 0.4
         |        + LEAST(stop_hits / 3.0, 1.0) * 0.3
         |        + GREATEST(0.0, 1.0 - praw * 5.0) * 0.3, 6) AS q
         |  FROM t),
         |f AS (SELECT doc_id, text, q FROM q WHERE q >= 0.5),
         |s AS (
         |  SELECT doc_id, q,
         |    $de AS sde, $en AS sen, $es AS ses, $fr AS sfr, $zh AS szh
         |  FROM f),
         |p AS (
         |  SELECT doc_id, q,
         |    CASE WHEN GREATEST(sde, sen, ses, sfr, szh) = 0 THEN 'und'
         |         WHEN sde = GREATEST(sde, sen, ses, sfr, szh) THEN 'de'
         |         WHEN sen = GREATEST(sde, sen, ses, sfr, szh) THEN 'en'
         |         WHEN ses = GREATEST(sde, sen, ses, sfr, szh) THEN 'es'
         |         WHEN sfr = GREATEST(sde, sen, ses, sfr, szh) THEN 'fr'
         |         ELSE 'zh' END AS pred
         |  FROM s)
         |SELECT pred, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
         |FROM p GROUP BY pred ORDER BY pred""".stripMargin
    },

    "text_decontaminate" -> decontaminateExactOracle,

    // Bloom pruning is answer-preserving (false positives verified away
    // by the exact semi-join), so the Bloom variant's oracle IS the
    // exact decontamination SQL.
    "text_decontaminate_bloom" -> decontaminateExactOracle,

    // per-doc DISTINCT 8-gram counts + benchmark-hit share; list_distinct
    // mirrors WordShingles' distinct semantics
    "text_contamination_frac" -> {
      val words8 =
        "string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ')"
      val sh8 = """CASE WHEN len(words) < 8 THEN [array_to_string(words, ' ')]
        |    ELSE list_transform(range(1, len(words) - 6),
        |           i -> array_to_string(words[i:i+7], ' ')) END""".stripMargin
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |w0 AS (SELECT doc_id, $words8 AS words FROM d),
         |spans AS (SELECT doc_id AS bid, array_to_string(words[1:8], ' ') AS span
         |  FROM w0 WHERE doc_id < 20),
         |planted AS (
         |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || s.span AS text
         |  FROM d JOIN spans s ON d.doc_id % 20 = s.bid
         |  WHERE d.doc_id >= 100 AND d.doc_id < 200),
         |corpus AS (SELECT doc_id, text FROM d
         |  UNION ALL SELECT doc_id, text FROM planted),
         |cw AS (SELECT doc_id, $words8 AS words FROM corpus),
         |csh AS (SELECT doc_id, unnest(list_distinct($sh8)) AS sg FROM cw),
         |bw AS (SELECT doc_id, $words8 AS words FROM d WHERE doc_id < 20),
         |bsh AS (SELECT DISTINCT unnest(list_distinct($sh8)) AS sg FROM bw),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    CAST(sum(CASE WHEN sg IN (SELECT sg FROM bsh) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_contaminated
         |  FROM csh GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_contaminated,
         |  round(CAST(n_contaminated AS DOUBLE) / n_grams, 6) AS contamination
         |FROM agg ORDER BY doc_id""".stripMargin
    },

    "text_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val num = "\\d{9,}"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
         |    text || ' contact bob.smith+x@mail.example.org or 10.42.0.255 ref 9876543210123' AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ipv4')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '$num')) AS BIGINT) AS n_longnums,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'),
         |    '$ipv4', '<IP>', 'g'),
         |    '$num', '<NUM>', 'g') AS scrubbed
         |FROM corpus ORDER BY doc_id""".stripMargin
    },

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // composed (é = chr(233), 가 = chr(44032)) and decomposed
    // (e+chr(769), chr(4352)+chr(4449)) suffixes must land in ONE group
    "text_fingerprint_nfc" ->
      """WITH corpus AS (
        |  SELECT doc_id, text || ' caf' || chr(233) || ' ' || chr(44032) AS text
        |  FROM documents
        |  UNION ALL SELECT doc_id + 1000000,
        |    text || ' cafe' || chr(769) || ' ' || chr(4352) || chr(4449) AS text
        |  FROM documents)
        |SELECT md5(regexp_replace(replace(replace(lower(trim(nfc_normalize(text))), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keeper, COUNT(*) AS n
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id AS asset_id,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS sha256,
        |  upper(substr(hex(encode(text)), 1, 8)) AS magic
        |FROM documents ORDER BY asset_id""".stripMargin,

    "mm_features" -> mmFeaturesOracle,

    "mm_frames" -> mmFramesOracle,

    "mm_resize" -> mmResizeOracle,

    "mm_decode_real" -> mmDecodeRealOracle,
    "mm_phash_dedup" -> mmPhashOracle,
    "mm_phash_dedup_tight" -> mmPhashTightOracle,
    "mm_audio_decode" -> mmAudioDecodeOracle,
    "mm_audio_dedup" -> mmAudioDedupOracle,
    "mm_video_demux" -> mmVideoDemuxOracle,
    "mm_video_dedup" -> mmVideoDedupOracle,
    "mm_video_scenes" -> mmVideoScenesOracle,
    "mm_audio_segments" -> mmAudioSegmentsOracle,

    // hashed unigram LM: identical md5 buckets, quantized log2 via the
    // exact bin()-length trick on both engines
    "text_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, (md5_number_lower(token) >> 1) % 1024 AS bucket
        |  FROM tok),
        |lm AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(length(bin(cnt)) - 1) AS BIGINT) AS logq_sum
        |  FROM b JOIN lm USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, logq_sum,
        |  round(CAST(logq_sum AS DOUBLE) / n_tokens, 6) AS lm_score
        |FROM sc ORDER BY doc_id""".stripMargin,

    // bigram Stupid Backoff: identical md5 buckets for bigram strings
    // and both unigrams, quantized logs via bin()-length, CASE backoff
    // with the fixed integer penalty
    "text_bigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |uni AS (
        |  SELECT (md5_number_lower(u.token) >> 1) % 1024 AS bucket,
        |    count(*) AS cnt
        |  FROM (SELECT unnest(t) AS token FROM tok
        |    JOIN documents USING (doc_id) WHERE lang = 'en') u
        |  GROUP BY 1),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i::INT], w2 := t[i::INT + 1]))) AS p
        |  FROM tok WHERE len(t) >= 2),
        |bib AS (
        |  SELECT doc_id,
        |    (md5_number_lower(p.w1 || ' ' || p.w2) >> 1) % 1024 AS bb,
        |    (md5_number_lower(p.w1) >> 1) % 1024 AS b1,
        |    (md5_number_lower(p.w2) >> 1) % 1024 AS b2
        |  FROM bg),
        |bi AS (
        |  SELECT bb AS bucket, count(*) AS cnt
        |  FROM bib JOIN documents USING (doc_id)
        |  WHERE lang = 'en' GROUP BY 1),
        |q AS (
        |  SELECT x.doc_id,
        |    CASE WHEN b.cnt IS NOT NULL
        |      THEN (length(bin(b.cnt)) - 1)
        |        - (length(bin(coalesce(u1.cnt, 0))) - 1)
        |      ELSE (length(bin(coalesce(u2.cnt, 0))) - 1) - 4
        |    END AS q
        |  FROM bib x
        |  LEFT JOIN bi b ON x.bb = b.bucket
        |  LEFT JOIN uni u1 ON x.b1 = u1.bucket
        |  LEFT JOIN uni u2 ON x.b2 = u2.bucket),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(q) AS BIGINT) AS logq_sum
        |  FROM q GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, logq_sum,
        |  round(CAST(logq_sum AS DOUBLE) / n_bigrams, 6) AS bo_score
        |FROM sc ORDER BY doc_id""".stripMargin,

    // NB log-count-ratio classifier: identical md5 buckets, quantized
    // logs via the exact bin()-length trick, integer weight sums
    "text_quality_clf" ->
      """WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS pos, unnest(string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, pos, (md5_number_lower(token) >> 1) % 1024 AS bucket
        |  FROM tok),
        |m AS (
        |  SELECT bucket,
        |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_cnt,
        |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_cnt
        |  FROM b GROUP BY 1),
        |w AS (
        |  SELECT bucket,
        |    (length(bin(pos_cnt)) - 1) - (length(bin(neg_cnt)) - 1) AS weight
        |  FROM m),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(coalesce(weight, 0)) AS BIGINT) AS clf_sum
        |  FROM b LEFT JOIN w USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_tokens, clf_sum,
        |  round(CAST(clf_sum AS DOUBLE) / n_tokens, 6) AS clf_mean
        |FROM sc ORDER BY doc_id""".stripMargin,

    // DSIR: unigram+bigram hashed features, quantized log-likelihood
    // ratio of the en-target vs raw distributions, deterministic top-100
    "text_dsir_select" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, unnest(toks || CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)),
        |      i -> array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+1], ' '))
        |    ELSE [] END) AS feat
        |  FROM t),
        |b AS (
        |  SELECT doc_id, lang, (md5_number_lower(feat) >> 1) % 1024 AS bucket
        |  FROM feats),
        |tc AS (SELECT bucket, count(*) AS cnt FROM b WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
        |lam AS (
        |  SELECT rc.bucket,
        |    (length(bin(coalesce(tc.cnt, 0))) - 1) - (length(bin(rc.cnt)) - 1) AS lambda
        |  FROM rc LEFT JOIN tc USING (bucket)),
        |sc AS (
        |  SELECT doc_id, count(*) AS n_feats,
        |    CAST(sum(coalesce(lambda, 0)) AS BIGINT) AS dsir_sum
        |  FROM b LEFT JOIN lam USING (bucket) GROUP BY 1),
        |sel AS (
        |  SELECT doc_id, n_feats, dsir_sum,
        |    round(CAST(dsir_sum AS DOUBLE) / n_feats, 6) AS dsir_mean
        |  FROM sc ORDER BY dsir_mean DESC, doc_id LIMIT 100)
        |SELECT doc_id, n_feats, dsir_sum, dsir_mean
        |FROM sel ORDER BY doc_id""".stripMargin,

    "text_rep_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |c2 AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)),
        |        i -> array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+1], ' '))
        |      ELSE [] END) AS gram FROM t)
        |  GROUP BY 1, 2),
        |top2 AS (
        |  SELECT doc_id, cnt * length(gram) AS topchars FROM (
        |    SELECT doc_id, gram, cnt,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rk
        |    FROM c2) WHERE rk = 1),
        |tot2 AS (SELECT doc_id, sum(cnt * length(gram)) AS tot
        |  FROM c2 GROUP BY 1),
        |d5 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS dup,
        |    sum(cnt * length(gram)) AS tot,
        |    sum(cnt) AS m
        |  FROM (
        |    SELECT doc_id, gram, count(*) AS cnt FROM (
        |      SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
        |        THEN list_transform(range(1, len(toks) - 3),
        |          i -> array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+4], ' '))
        |        ELSE [] END) AS gram FROM t)
        |    GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT t.doc_id,
        |  CASE WHEN coalesce(tot2.tot, 0) = 0 THEN 0.0
        |    ELSE round(CAST(top2.topchars AS DOUBLE) / tot2.tot, 6) END AS top2,
        |  CASE WHEN coalesce(d5.m, 0) < 2 OR coalesce(d5.tot, 0) = 0 THEN 0.0
        |    ELSE round(CAST(d5.dup AS DOUBLE) / d5.tot, 6) END AS dup5
        |FROM t LEFT JOIN top2 ON t.doc_id = top2.doc_id
        |  LEFT JOIN tot2 ON t.doc_id = tot2.doc_id
        |  LEFT JOIN d5 ON t.doc_id = d5.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "text_bpe_train" -> bpeTrainOracle(3),
    "text_bpe_train_deep" -> bpeTrainBatchedOracle(64, 8),

    "text_bpe_encode" -> bpeApplyOracle(3),

    "text_boilerplate" ->
      """WITH corpus AS (
        |  SELECT doc_id, text || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter today'
        |         ELSE 'footer note ' || CAST(doc_id AS VARCHAR) END || chr(10) ||
        |    CASE WHEN doc_id % 5 = 0 THEN 'cookie policy accept all'
        |         ELSE 'unique line ' || CAST(doc_id AS VARCHAR) END AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS pos, ls[CAST(i AS INT) + 1] AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
        |       UNNEST(range(0, len(ls))) AS t(i)),
        |freq AS (SELECT line FROM lines
        |  GROUP BY line HAVING count(DISTINCT doc_id) >= 50),
        |kept AS (SELECT doc_id, pos, line FROM lines
        |  WHERE line NOT IN (SELECT line FROM freq)),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id AS id, coalesce(a.text, '') AS text
        |FROM (SELECT doc_id FROM corpus) d LEFT JOIN agg a USING (doc_id)
        |ORDER BY id""".stripMargin,

    "text_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |p AS (
        |  SELECT substr(w, CAST(i AS INT), 2) AS pair
        |  FROM toks, UNNEST(range(1, length(w))) AS t(i)
        |  WHERE length(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM p
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    "text_nfc" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' ' || chr(4352) || chr(4449) AS text
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  (nfc_normalize(text) != text) AS changed
        |FROM corpus ORDER BY doc_id""".stripMargin,

    "text_c4_filters" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'too short.'
        |      || chr(10) || 'this line has plenty of words but no terminal mark'
        |      || chr(10) || 'please enable javascript to view item ' || CAST(doc_id AS VARCHAR) || '.'
        |      || chr(10) || 'a perfectly fine closing sentence about document ' || CAST(doc_id AS VARCHAR) || '.'
        |      || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.'
        |              WHEN doc_id % 23 = 0 THEN chr(10) || 'if (x) { return; }'
        |              ELSE '' END AS text
        |  FROM documents WHERE doc_id < 500),
        |sig AS (
        |  SELECT doc_id AS id,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(trim(l), '[.!?"”]$')
        |      AND len(list_filter(regexp_split_to_array(trim(l), '\s+'), t -> t != '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept,
        |    contains(lower(text), 'lorem ipsum') AS has_lorem,
        |    contains(text, '{') AS has_curly
        |  FROM corpus)
        |SELECT id, n_lines, CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  has_lorem, has_curly, array_to_string(kept, chr(10)) AS clean_text,
        |  (len(kept) >= 3 AND NOT has_lorem AND NOT has_curly) AS keep
        |FROM sig ORDER BY id""".stripMargin,

    "text_url_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(doc_id // 4 AS BIGINT) AS g
        |  FROM documents WHERE doc_id < 1000),
        |planted AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTPS://' || upper('site' || CAST(g % 7 AS VARCHAR) || '.example.org')
        |        || ':443/p/' || CAST(g AS VARCHAR) || '?utm_source=feed&b=2&a=1#frag'
        |      WHEN 1 THEN 'https://site' || CAST(g % 7 AS VARCHAR) || '.example.org/p/'
        |        || CAST(g AS VARCHAR) || '?a=1&b=2'
        |      WHEN 2 THEN 'https://www.site' || CAST(g % 7 AS VARCHAR) || '.example.org/p/'
        |        || CAST(g AS VARCHAR) || '/?b=2&a=1&gclid=z'
        |      ELSE 'https://site' || CAST(g % 7 AS VARCHAR) || '.example.org/p/'
        |        || CAST(g AS VARCHAR) || '?b=2&utm_medium=mail&a=1'
        |    END AS url
        |  FROM base),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS pathq
        |  FROM planted),
        |pieces AS (
        |  SELECT doc_id, scheme,
        |    regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\.', '') AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |    CASE WHEN position('?' IN pathq) > 0 THEN split_part(pathq, '?', 1) ELSE pathq END AS path0,
        |    CASE WHEN position('?' IN pathq) > 0 THEN substr(pathq, position('?' IN pathq) + 1) ELSE '' END AS query
        |  FROM parts),
        |normed AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |           OR (scheme = 'https' AND port = '443') THEN ''
        |         ELSE ':' || port END ||
        |    regexp_replace(path0, '/+$', '') ||
        |    CASE WHEN len(list_filter(string_split(query, '&'), p -> p != ''
        |           AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)='))) = 0
        |         THEN ''
        |         ELSE '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
        |           p -> p != '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)='))), '&') END
        |    AS url_norm
        |  FROM pieces)
        |SELECT url_norm, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n
        |FROM normed GROUP BY 1 ORDER BY url_norm""".stripMargin,

    "text_domains" -> {
      val url = "https?://[A-Za-z0-9.-]+[A-Za-z0-9](/[A-Za-z0-9/._~-]*)?"
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |    text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
         |      || '.example.org/p/' || CAST(doc_id AS VARCHAR)
         |      || CASE WHEN doc_id % 12 = 0
         |         THEN ' and http://mirror.example.net/x' || CAST(doc_id AS VARCHAR)
         |         ELSE '' END AS text
         |  FROM documents WHERE doc_id % 3 = 0),
         |u AS (
         |  SELECT doc_id, unnest(regexp_extract_all(text, '$url', 0)) AS url
         |  FROM corpus),
         |d AS (
         |  SELECT doc_id,
         |    regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
         |  FROM u)
         |SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_hits
         |FROM d GROUP BY 1 ORDER BY domain""".stripMargin
    },

    // components via recursive transitive closure (min reachable id) —
    // the same chain+hub edge construction as the Spark side
    "dedup_cluster" ->
      """WITH RECURSIVE
        |base AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        |corpus AS (
        |  SELECT doc_id AS id FROM base
        |  UNION ALL SELECT doc_id + 1000000 FROM base WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 2000000 FROM base WHERE doc_id < 200),
        |e AS (
        |  SELECT doc_id AS a, doc_id + 1000000 AS b FROM base WHERE doc_id < 200
        |  UNION ALL SELECT doc_id + 1000000, doc_id + 2000000 FROM base WHERE doc_id < 200
        |  UNION ALL SELECT doc_id, 5000 + doc_id % 10 FROM base WHERE doc_id < 50),
        |und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
        |reach(id, r) AS (
        |  SELECT u, u FROM und
        |  UNION
        |  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT c.id, coalesce(comp.component, c.id) AS component,
        |  c.id = coalesce(comp.component, c.id) AS keep
        |FROM corpus c LEFT JOIN comp ON c.id = comp.id
        |ORDER BY c.id""".stripMargin,

    "sample_split" ->
      s"""WITH b AS (
         |  SELECT doc_id, $bucketExpr AS bucket FROM documents),
         |s AS (SELECT doc_id,
         |  CASE WHEN bucket < 8000 THEN 'train'
         |       WHEN bucket < 9000 THEN 'val'
         |       ELSE 'test' END AS split FROM b)
         |SELECT split, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  min(doc_id) AS id_min, max(doc_id) AS id_max
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "sample_stratified" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, $bucketExpr AS bucket FROM documents)
         |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b
         |WHERE bucket < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 1000
         |  ELSE 2500 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_mixture" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |tt AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
         |th AS (SELECT lang,
         |  CAST(floor(least(1.0,
         |    (CASE lang WHEN 'de' THEN 0.25 WHEN 'en' THEN 0.25
         |               WHEN 'fr' THEN 0.25 WHEN 'zh' THEN 0.25
         |               ELSE 0.0 END) * total / CAST(n AS DOUBLE))
         |    * 10000 + 0.5) AS BIGINT) AS thr
         |  FROM c, tt),
         |b AS (SELECT doc_id, lang, $bucketExpr AS bucket FROM documents)
         |SELECT b.lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b JOIN th ON b.lang = th.lang
         |WHERE b.bucket < th.thr
         |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    // temperature mixture at T=2: thresholds from sqrt shares. The z
    // normalizer sums the per-stratum sqrts in LANG ORDER via an ordered
    // list aggregate — the Scala side folds the name-sorted counts, and
    // FP addition is order-sensitive
    "sample_mixture_temp" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |z AS (SELECT
         |    list_aggregate(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang), 'sum') AS z,
         |    CAST(sum(n) AS DOUBLE) AS total
         |  FROM c),
         |th AS (SELECT lang,
         |    CAST(floor(least(1.0,
         |      sqrt(CAST(n AS DOUBLE)) / z.z * z.total / CAST(n AS DOUBLE))
         |      * 10000 + 0.5) AS BIGINT) AS thr
         |  FROM c, z),
         |b AS (SELECT doc_id, lang, $bucketExpr AS bucket FROM documents)
         |SELECT b.lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b JOIN th ON b.lang = th.lang
         |WHERE b.bucket < th.thr
         |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    // T=4 twin: the identical two-sqrt chain evaluates in both engines
    "sample_mixture_temp4" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |z AS (SELECT
         |    list_aggregate(list(sqrt(sqrt(CAST(n AS DOUBLE))) ORDER BY lang), 'sum') AS z,
         |    CAST(sum(n) AS DOUBLE) AS total
         |  FROM c),
         |th AS (SELECT lang,
         |    CAST(floor(least(1.0,
         |      sqrt(sqrt(CAST(n AS DOUBLE))) / z.z * z.total / CAST(n AS DOUBLE))
         |      * 10000 + 0.5) AS BIGINT) AS thr
         |  FROM c, z),
         |b AS (SELECT doc_id, lang, $bucketExpr AS bucket FROM documents)
         |SELECT b.lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b JOIN th ON b.lang = th.lang
         |WHERE b.bucket < th.thr
         |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    "text_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |tfx AS (SELECT token, count(*) AS tf
        |  FROM (SELECT unnest(t) AS token FROM toks) GROUP BY 1),
        |dfx AS (SELECT token, count(*) AS df
        |  FROM (SELECT unnest(list_distinct(t)) AS token FROM toks) GROUP BY 1)
        |SELECT tfx.token, tfx.tf, dfx.df
        |FROM tfx JOIN dfx ON tfx.token = dfx.token
        |ORDER BY tfx.tf DESC, tfx.token LIMIT 100""".stripMargin,

    "text_chunk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id AS id, CAST(i - 1 AS INT) AS chunk_id,
        |  CAST(least(32, len(t) - (i - 1) * 32) AS BIGINT) AS n_tokens,
        |  array_to_string(t[(i - 1) * 32 + 1 : (i - 1) * 32 + 32], ' ') AS chunk
        |FROM w, unnest(generate_series(1,
        |  greatest(CAST(ceil(len(t) / 32.0) AS BIGINT), 1))) AS g(i)
        |ORDER BY id, chunk_id""".stripMargin,

    "text_chunk_sliding" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id AS id, CAST(i AS INT) AS chunk_id,
        |  CAST(i * 24 AS BIGINT) AS start,
        |  CAST(least(32, len(t) - i * 24) AS BIGINT) AS n_tokens,
        |  array_to_string(t[CAST(i * 24 + 1 AS INT) : CAST(i * 24 + 32 AS INT)], ' ') AS chunk
        |FROM w, unnest(range(0,
        |  greatest(CAST(ceil((len(t) - 32) / 24.0) AS BIGINT), 0) + 1)) AS g(i)
        |ORDER BY id, chunk_id""".stripMargin,

    "text_pack" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id AS id, CAST(i - 1 AS INT) AS chunk_id,
        |    CAST(least(32, len(t) - (i - 1) * 32) AS BIGINT) AS n_tokens
        |  FROM w, unnest(generate_series(1,
        |    greatest(CAST(ceil(len(t) / 32.0) AS BIGINT), 1))) AS g(i)),
        |o AS (
        |  SELECT id, chunk_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY id, chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |  FROM ch)
        |SELECT id, chunk_id, n_tokens, CAST(tok_offset AS BIGINT) AS tok_offset,
        |  CAST(tok_offset // 512 AS BIGINT) AS seq_id,
        |  CAST(tok_offset % 512 AS BIGINT) AS seq_pos,
        |  (tok_offset % 512) + n_tokens > 512 AS spans_next
        |FROM o ORDER BY id, chunk_id""".stripMargin,

    "sim_quantize_int8" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT id, v, list_max(list_transform(v, x -> abs(x))) AS am FROM v),
        |q AS (SELECT id, am / 127.0 AS scale,
        |    CASE WHEN am = 0 THEN list_transform(v, x -> 0)
        |         ELSE list_transform(v, x -> CAST(floor(x / (am / 127.0) + 0.5) AS INT))
        |    END AS q
        |  FROM s)
        |SELECT id, round(scale, 6) AS scale,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_min(q) AS INT) AS q_min,
        |  CAST(list_max(q) AS INT) AS q_max
        |FROM q ORDER BY id""".stripMargin,

    "sim_semdedup" -> semdedupOracle,

    "corpus_pipeline" -> {
      val stopHits = TextAnalysis.enStopwords.map { w =>
        s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      val email = TextAnalysis.piiEmailRe
      val ipv4 = TextAnalysis.piiIpv4Re
      val num = TextAnalysis.piiLongNumRe
      s"""WITH corpus AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text, source FROM documents),
         |dedup AS (
         |  SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM corpus)
         |  WHERE rn = 1),
         |gm AS (
         |  SELECT doc_id, text, source,
         |    CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         |    $stopHits AS stop_hits,
         |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM dedup),
         |g AS (
         |  SELECT doc_id, text, source FROM gm
         |  WHERE n_words >= 20 AND n_words <= 100000
         |    AND (CASE WHEN n_words = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_words END) >= 3.0
         |    AND (CASE WHEN n_words = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_words END) <= 10.0
         |    AND (CASE WHEN trim(text) = '' THEN 0.0
         |      ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) END) >= 0.8
         |    AND stop_hits >= 2),
         |scr AS (
         |  SELECT doc_id, source,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '$email', '<EMAIL>', 'g'),
         |      '$ipv4', '<IP>', 'g'),
         |      '$num', '<NUM>', 'g') AS text
         |  FROM g),
         |b AS (
         |  SELECT doc_id, source, text, $bucketExpr AS bucket,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY $bucketExpr, doc_id) AS rn
         |  FROM scr),
         |capped AS (SELECT doc_id, source, text, bucket FROM b WHERE rn <= 20),
         |sp AS (
         |  SELECT source, text,
         |    CASE WHEN bucket < 9000 THEN 'train' ELSE 'val' END AS split
         |  FROM capped)
         |SELECT split, source, count(*) AS n,
         |  CAST(sum(CASE WHEN trim(text) = '' THEN 0
         |    ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split, source ORDER BY split, source""".stripMargin
    },

    "corpus_pipeline_stream" -> corpusPipelineStreamOracle,

    "text_gopher" -> {
      val stopHits = TextAnalysis.enStopwords.map { w =>
        s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         |    $stopHits AS stop_hits,
         |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, n_words, stop_hits,
         |    CASE WHEN n_words = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_words END AS mwl,
         |    CASE WHEN trim(text) = '' THEN 0.0
         |      ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w) END AS awr
         |  FROM t)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |  round(mwl, 6) AS mean_word_len,
         |  round(awr, 6) AS alpha_word_ratio, stop_hits,
         |  (n_words >= 20 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
         |   AND awr >= 0.8 AND stop_hits >= 2) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "text_bm25" -> bm25Oracle(bm25Terms, 20),

    "text_hybrid_rrf" -> hybridOracle(bm25Terms, queryVecId = 7L, k = 20,
      poolK = 50, kRrf = 60),

    "graph_pagerank" -> pageRankOracle(5),

    "stream_replacing_replay" -> cdcReplayOracle,

    "stream_funnel_replay" -> funnelReplayOracle,

    "stream_retention_replay" -> retentionReplayOracle,

    "stream_analytics_replay" -> analyticsReplayOracle,

    "stream_multitier_replay" -> multitierReplayOracle,

    "stream_uniq_hll_replay" -> streamingUniqHllOracle,

    "stream_kmv_replay" -> streamingKmvOracle,

    // per batch b: the q_quantile_sketch pipeline over rows with
    // b' <= b for the keys touched in b
    "stream_quantile_replay" -> {
      def out(b: Int) =
        s"""v$b AS (
           |  SELECT flag, s FROM v WHERE b <= $b
           |    AND flag IN (SELECT DISTINCT flag FROM v WHERE b = $b)),
           |bk$b AS (
           |  SELECT flag, s, GREATEST(length(bin(s)) - 8, 0) AS w FROM v$b),
           |h$b AS (
           |  SELECT flag, (s >> w) << w AS blo, count(*) AS cnt
           |  FROM bk$b GROUP BY 1, 2),
           |c$b AS (
           |  SELECT flag, blo, cnt,
           |    sum(cnt) OVER (PARTITION BY flag ORDER BY blo) AS cum,
           |    sum(cnt) OVER (PARTITION BY flag) AS n
           |  FROM h$b),
           |out$b AS (
           |  SELECT $b AS batch, flag, CAST(max(n) AS BIGINT) AS n,
           |    CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN blo END)
           |      AS DOUBLE) / CAST(100 AS DOUBLE) AS p50,
           |    CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN blo END)
           |      AS DOUBLE) / CAST(100 AS DOUBLE) AS p90
           |  FROM c$b GROUP BY flag)"""
      s"""WITH v AS (
         |  SELECT l_returnflag AS flag, l_orderkey % 3 AS b,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS s
         |  FROM lineitem),
         |${(0 to 2).map(out).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT * FROM out0 UNION ALL
         |  SELECT * FROM out1 UNION ALL
         |  SELECT * FROM out2)
         |ORDER BY batch, flag""".stripMargin
    },

    // per batch b: full-history (key, version) nets for the pairs
    // touched in b — survival flips off at net 0 and back ON (sign -1)
    // at the second cancel; payload follows the surviving side
    "stream_versioned_replay" -> {
      def out(b: Int) =
        s"""out$b AS (
           |  SELECT $b AS batch, k, ver,
           |    CAST(sum(sign) AS BIGINT) AS net,
           |    sum(sign) <> 0 AS surviving,
           |    round(CASE WHEN sum(sign) > 0
           |        THEN max(CASE WHEN sign = 1 THEN tp END)
           |      WHEN sum(sign) < 0
           |        THEN max(CASE WHEN sign = -1 THEN tp END)
           |      END, 6) AS totalprice
           |  FROM t WHERE b <= $b AND EXISTS (SELECT 1 FROM t t2
           |    WHERE t2.b = $b AND t2.k = t.k AND t2.ver = t.ver)
           |  GROUP BY k, ver)"""
      s"""WITH base AS (
         |  SELECT o_orderkey % 149 AS k, o_orderkey // 149 AS ver,
         |    o_orderkey % 3 AS g, o_totalprice AS tp
         |  FROM orders WHERE o_orderkey < 3000),
         |t AS (
         |  SELECT 0 AS b, k, 1 AS sign, ver, tp FROM base WHERE g = 0
         |  UNION ALL SELECT 1, k, 1, ver, tp FROM base WHERE g = 1
         |  UNION ALL SELECT 1, k, -1, ver, tp FROM base
         |    WHERE g = 0 AND ver % 2 = 0
         |  UNION ALL SELECT 2, k, 1, ver, tp FROM base WHERE g = 2
         |  UNION ALL SELECT 2, k, -1, ver, tp FROM base
         |    WHERE g = 1 AND ver % 2 = 0
         |  UNION ALL SELECT 2, k, -1, ver, tp FROM base
         |    WHERE g = 0 AND ver % 10 = 0),
         |${(0 to 2).map(out).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT * FROM out0 UNION ALL
         |  SELECT * FROM out1 UNION ALL
         |  SELECT * FROM out2)
         |ORDER BY batch, k, ver""".stripMargin
    },

    // per batch b: full-history sums for the keys touched in b; compare
    // surface rounded through DOUBLE on both sides (the standing state
    // stays exact DECIMAL(28,2) — only the emitted row is rounded)
    "stream_summing_replay" -> {
      def out(b: Int) =
        s"""out$b AS (
           |  SELECT $b AS batch, k,
           |    round(CAST(sum(qty) AS DOUBLE), 6) AS qty,
           |    round(CAST(sum(price) AS DOUBLE), 6) AS price
           |  FROM t WHERE b <= $b AND k IN (SELECT k FROM t WHERE b = $b)
           |  GROUP BY k)"""
      s"""WITH t AS (
         |  SELECT l_partkey % 500 AS k, l_orderkey % 3 AS b,
         |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
         |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
         |  FROM lineitem),
         |${(0 to 2).map(out).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT * FROM out0 UNION ALL
         |  SELECT * FROM out1 UNION ALL
         |  SELECT * FROM out2)
         |ORDER BY batch, k""".stripMargin
    },

    // ReplacingMergeTree FINAL: last version per key (ver unique here,
    // so row_number on ver DESC is the whole-row max struct)
    "q_replacing_merge" ->
      """SELECT o_orderkey % 1000 AS k, o_orderkey AS ver,
        |  o_orderstatus AS status, round(o_totalprice, 6) AS totalprice
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_orderkey % 1000 ORDER BY o_orderkey DESC) = 1
        |ORDER BY k""".stripMargin,

    // Compare surface rounded through DOUBLE on both sides — the
    // driver's hasher rejects DECIMAL renderings even when values and
    // DuckDB-visible types match (width-aligned casts were tried in r11
    // and still red); the exact-decimal fold is pinned by unit tests.
    "q_summing_merge" ->
      """SELECT l_partkey % 500 AS k,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS price
        |FROM lineitem GROUP BY 1 ORDER BY k""".stripMargin,

    "q_collapsing_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey % 97 AS k,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END AS sign,
        |    o_orderkey AS ver, o_totalprice AS tp
        |  FROM orders),
        |a AS (
        |  SELECT k, sum(sign) AS net,
        |    max(CASE WHEN sign = 1 THEN ver END) AS ver
        |  FROM t GROUP BY 1)
        |SELECT a.k, a.ver, round(t.tp, 6) AS totalprice
        |FROM a JOIN t ON a.k = t.k AND a.ver = t.ver
        |WHERE a.net > 0
        |ORDER BY a.k""".stripMargin,

    // VersionedCollapsing: the fold replayed per (key, version) — net 0
    // pairs vanish, net != 0 keeps sgn(net) and that side's payload
    "q_versioned_collapsing" ->
      """WITH t AS (
        |  SELECT o_orderkey % 149 AS k, 1 AS sign,
        |    o_orderkey // 149 AS ver, o_totalprice AS tp FROM orders
        |  UNION ALL
        |  SELECT o_orderkey % 149, -1, o_orderkey // 149, o_totalprice
        |  FROM orders WHERE (o_orderkey // 149) % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey % 149, -1, (o_orderkey // 149) + 1000000,
        |    o_totalprice FROM orders WHERE (o_orderkey // 149) % 7 = 3),
        |a AS (
        |  SELECT k, ver, sum(sign) AS net,
        |    max(CASE WHEN sign = 1 THEN tp END) AS tp_p,
        |    max(CASE WHEN sign = -1 THEN tp END) AS tp_m
        |  FROM t GROUP BY 1, 2)
        |SELECT k, ver, CASE WHEN net > 0 THEN 1 ELSE -1 END AS sign,
        |  round(CASE WHEN net > 0 THEN tp_p ELSE tp_m END, 6) AS totalprice
        |FROM a WHERE net <> 0
        |ORDER BY k, ver""".stripMargin,

    // resample + fill + LOCF (portable count-group trick) + lag delta +
    // exact decimal moving sum divided once at the end
    "q_timeseries_fill" ->
      """WITH pts AS (
        |  SELECT user_id % 10 AS k,
        |    CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS b,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |bk AS (SELECT k, b, max(v) AS v0, count(*) AS n FROM pts GROUP BY 1, 2),
        |gr AS (
        |  SELECT k, unnest(generate_series(lo, hi)) AS b FROM
        |    (SELECT k, min(b) AS lo, max(b) AS hi FROM pts GROUP BY 1)),
        |fl AS (
        |  SELECT g.k, g.b, bk.v0, coalesce(bk.n, 0) AS n,
        |    bk.v0 IS NULL AS filled
        |  FROM gr g LEFT JOIN bk ON g.k = bk.k AND g.b = bk.b),
        |lc AS (
        |  SELECT k, b, n, filled,
        |    max(v0) OVER (PARTITION BY k, grp) AS v
        |  FROM (SELECT *, count(v0) OVER (
        |    PARTITION BY k ORDER BY b) AS grp FROM fl)),
        |dl AS (
        |  SELECT k, b, v, n, filled,
        |    v - lag(v) OVER (PARTITION BY k ORDER BY b) AS delta,
        |    CASE WHEN count(v) OVER w4 > 0
        |      THEN round(CAST(sum(v) OVER w4 AS DOUBLE)
        |        / count(v) OVER w4, 6)
        |    END AS mov_avg
        |  FROM lc
        |  WINDOW w4 AS (PARTITION BY k ORDER BY b
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT k, b, round(CAST(v AS DOUBLE), 6) AS v, n, filled,
        |  round(CAST(delta AS DOUBLE), 6) AS delta, mov_avg FROM dl
        |ORDER BY k, b""".stripMargin,

    // WITH FILL ... INTERPOLATE: same resample/grid CTEs, gap buckets
    // take prev + (next - prev) * (b - pb) / (nb - pb) — the identical
    // IEEE expression tree the Spark side evaluates
    "q_timeseries_interp" ->
      """WITH pts AS (
        |  SELECT user_id % 10 AS k,
        |    CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS b,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |bk AS (SELECT k, b, max(v) AS v0 FROM pts GROUP BY 1, 2),
        |gr AS (
        |  SELECT k, unnest(generate_series(lo, hi)) AS b FROM
        |    (SELECT k, min(b) AS lo, max(b) AS hi FROM pts GROUP BY 1)),
        |fl AS (
        |  SELECT g.k, g.b, bk.v0, bk.v0 IS NULL AS filled
        |  FROM gr g LEFT JOIN bk ON g.k = bk.k AND g.b = bk.b),
        |ip AS (
        |  SELECT k, b, filled, v0,
        |    last_value(v0 IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v0 IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER wb AS pb,
        |    first_value(v0 IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v0 IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER wf AS nb
        |  FROM fl
        |  WINDOW wb AS (PARTITION BY k ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY k ORDER BY b
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT k, b, filled,
        |  round(CASE WHEN v0 IS NOT NULL THEN CAST(v0 AS DOUBLE)
        |    ELSE CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
        |      * (CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
        |    END, 6) AS v
        |FROM ip ORDER BY k, b""".stripMargin,

    // exists-chain funnel: level k iff a time-ordered chain of the first
    // k steps fits in the window measured from the chain start
    "q_window_funnel" -> windowFunnelExistsOracle,

    // the same exists-chain replay grades the SQL-aggregate surface
    // (graft_window_funnel UDAF == the DataFrame operator, so one
    // oracle serves both)
    "q_window_funnel_sql" -> windowFunnelExistsOracle,

    "q_retention_sql" -> retentionFlagsOracle,


    // strict_increase: the same exists-chain with strictly increasing
    // chain timestamps (the greedy-earliest walk stays exact under the
    // strict inequality by the same exchange argument)
    "q_window_funnel_strict" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |l1 AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
        |l2 AS (
        |  SELECT DISTINCT a.user_id
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |  WHERE a.event_type = 'view' AND b.event_type = 'click'
        |    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND),
        |l3 AS (
        |  SELECT DISTINCT a.user_id
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    JOIN ev c ON a.user_id = c.user_id
        |  WHERE a.event_type = 'view' AND b.event_type = 'click'
        |    AND c.event_type = 'purchase'
        |    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
        |    AND c.ts > b.ts AND c.ts <= a.ts + INTERVAL 14400 SECOND)
        |SELECT u.user_id,
        |  CASE WHEN l3.user_id IS NOT NULL THEN 3
        |       WHEN l2.user_id IS NOT NULL THEN 2
        |       WHEN l1.user_id IS NOT NULL THEN 1
        |       ELSE 0 END AS level
        |FROM u LEFT JOIN l1 ON u.user_id = l1.user_id
        |  LEFT JOIN l2 ON u.user_id = l2.user_id
        |  LEFT JOIN l3 ON u.user_id = l3.user_id
        |ORDER BY u.user_id""".stripMargin,

    // interrupt on a repeat of an already-matched step (e.s < w.level;
    // higher steps pass through); the +60s re-planted views make the
    // cut non-vacuous on this corpus
    "q_window_funnel_strict_dedup" -> funnelWalkOracle("e.s < w.level",
      plant = "\n  UNION ALL\n" +
        "  SELECT user_id AS u, epoch_us(ts + INTERVAL 60 SECOND) AS t,\n" +
        "    0 AS s FROM events WHERE event_type = 'view'"),

    // interrupt on ANY non-advancing step event
    "q_window_funnel_strict_order" -> funnelWalkOracle("true"),

    // ordered-triple EXISTS with no window bound
    "q_sequence_match" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('signup', 'view', 'purchase')
        |    AND ts < TIMESTAMP '2024-01-03 00:00:00'),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |m AS (
        |  SELECT DISTINCT a.user_id
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    JOIN ev c ON a.user_id = c.user_id
        |  WHERE a.event_type = 'signup' AND b.event_type = 'view'
        |    AND c.event_type = 'purchase'
        |    AND b.ts >= a.ts AND c.ts >= b.ts)
        |SELECT u.user_id, m.user_id IS NOT NULL AS matched
        |FROM u LEFT JOIN m ON u.user_id = m.user_id
        |ORDER BY u.user_id""".stripMargin,

    // greedy automaton replayed as a linear recursive CTE: state (level,
    // cnt) folds the (ts, stepIdx)-sorted events row by row
    "q_sequence_count" -> sequenceCountWalkOracle,

    "q_sequence_count_sql" -> sequenceCountWalkOracle,

    "q_retention" -> retentionFlagsOracle,

    "text_chunk_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(replace(replace(lower(trim(text)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'), ' ') AS t
        |  FROM corpus),
        |ch AS (
        |  SELECT doc_id AS id, CAST(i - 1 AS INT) AS chunk_id,
        |    array_to_string(t[(i - 1) * 16 + 1 : (i - 1) * 16 + 16], ' ') AS chunk
        |  FROM w, unnest(generate_series(1,
        |    greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS g(i)),
        |k AS (
        |  SELECT id, chunk_id, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY id, chunk_id) AS rn
        |  FROM ch)
        |SELECT id, count(*) AS n_chunks_kept,
        |  string_agg(chunk, ' ' ORDER BY chunk_id) AS text_dedup
        |FROM k WHERE rn = 1 GROUP BY id ORDER BY id""".stripMargin,

    // first occurrence per canonical paragraph fingerprint, original
    // text + order preserved in the reassembly
    "text_para_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    'shared boilerplate paragraph on every doc' || chr(10) || text
        |      || chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents
        |  UNION ALL SELECT doc_id + 1000000,
        |    'shared boilerplate paragraph on every doc' || chr(10) || text
        |      || chr(10) || 'unique tail ' || CAST(doc_id + 1000000 AS VARCHAR) AS text
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, CAST(i AS INT) - 1 AS pos,
        |    paras[CAST(i AS INT)] AS para
        |  FROM (SELECT doc_id, string_split_regex(text, '\n+') AS paras
        |        FROM corpus),
        |       UNNEST(generate_series(1, len(paras))) AS g(i)
        |  WHERE trim(paras[CAST(i AS INT)]) != ''),
        |k AS (
        |  SELECT doc_id, pos, para,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(replace(replace(lower(trim(para)), 'ς', 'σ'), 'i' || chr(775), 'i'), '\s+', ' ', 'g'))
        |      ORDER BY doc_id, pos) AS rn
        |  FROM p)
        |SELECT doc_id AS id, count(*) AS n_paras_kept,
        |  string_agg(para, chr(10) ORDER BY pos) AS text_dedup
        |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY id""".stripMargin,

    "sample_source_cap" ->
      s"""WITH b AS (
         |  SELECT doc_id, source, $bucketExpr AS bucket FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rn
         |  FROM b)
         |SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  min(doc_id) AS id_min, max(doc_id) AS id_max
         |FROM r WHERE rn <= 15 GROUP BY source ORDER BY source""".stripMargin,

    // cluster-balanced sampling: identical centroid re-derivation as the
    // IVF oracle, then the per-cell hash-order cap replayed as a window
    "sample_cluster_cap" ->
      s"""$ivfCellCtes,
         |kept AS (
         |  SELECT cell, vec_id, row_number() OVER (PARTITION BY cell
         |      ORDER BY ((md5_number_lower(CAST(vec_id AS VARCHAR)) >> 1) % 10000),
         |        vec_id) AS rn
         |  FROM cellof)
         |SELECT CAST(cell AS INT) AS cell, vec_id FROM kept
         |WHERE rn <= 10 ORDER BY cell, vec_id""".stripMargin,

    // cumulative window over the same (bucket, id) hash order; kept iff
    // the exclusive prefix + own size fits the budget
    "sample_token_cap" ->
      s"""WITH b AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_tokens,
         |    $bucketExpr AS bucket
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY bucket, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_offset
         |  FROM b)
         |SELECT source, doc_id, n_tokens, tok_offset
         |FROM c WHERE tok_offset + n_tokens <= 5000
         |ORDER BY source, tok_offset""".stripMargin,

    "q_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS b_event_id,
        |    arg_max(value, event_id) AS b_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.b_event_id,
        |  round(r.b_value, 6) AS b_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // forward direction: DuckDB ASOF with the inequality reversed picks
    // the EARLIEST right row at-or-after each left ts
    "q_asof_forward" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS b_event_id,
        |    arg_max(value, event_id) AS b_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.b_event_id,
        |  round(r.b_value, 6) AS b_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // nearest: recombine the two ASOF directions with the identical
    // interval-distance rule (exact timestamp arithmetic; ties prefer
    // the backward match)
    "q_asof_nearest" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS b_event_id,
        |    arg_max(value, event_id) AS b_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |bk AS (
        |  SELECT l.event_id, l.user_id, l.ts,
        |    r.ts AS m_ts, r.b_event_id AS m_id, r.b_value AS m_val
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
        |fw AS (
        |  SELECT l.event_id, r.ts AS m_ts, r.b_event_id AS m_id,
        |    r.b_value AS m_val
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts),
        |pick AS (
        |  SELECT bk.event_id, bk.user_id,
        |    CASE WHEN bk.m_ts IS NULL THEN fw.m_id
        |         WHEN fw.m_ts IS NULL THEN bk.m_id
        |         WHEN (fw.m_ts - bk.ts) < (bk.ts - bk.m_ts) THEN fw.m_id
        |         ELSE bk.m_id END AS b_event_id,
        |    CASE WHEN bk.m_ts IS NULL THEN fw.m_val
        |         WHEN fw.m_ts IS NULL THEN bk.m_val
        |         WHEN (fw.m_ts - bk.ts) < (bk.ts - bk.m_ts) THEN fw.m_val
        |         ELSE bk.m_val END AS b_value
        |  FROM bk JOIN fw USING (event_id))
        |SELECT event_id, user_id, b_event_id, round(b_value, 6) AS b_value
        |FROM pick ORDER BY event_id""".stripMargin,

    // strict inequality: the self-match at l.ts = r.ts is skipped, the
    // previous click wins (DuckDB ASOF supports the strict operator
    // directly)
    "q_asof_strict" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS b_event_id,
        |    arg_max(value, event_id) AS b_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.b_event_id,
        |  round(r.b_value, 6) AS b_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts > r.ts
        |ORDER BY l.event_id""".stripMargin,

    // the matched right ts is selectable from an ASOF join, so the
    // tolerance nullify is a plain CASE over it
    "q_asof_tolerance" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, max(event_id) AS b_event_id,
        |    arg_max(value, event_id) AS b_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id,
        |  CASE WHEN r.ts >= l.ts - INTERVAL 600 SECOND
        |    THEN r.b_event_id END AS b_event_id,
        |  CASE WHEN r.ts >= l.ts - INTERVAL 600 SECOND
        |    THEN round(r.b_value, 6) END AS b_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // SCD-2 semantics ARE a plain interval-containment left join — the
    // oracle states them directly; Spark gets the same answer from the
    // one-shuffle as-of + expiry null-out
    "q_temporal_join" ->
      """WITH dim AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k, v.version,
        |    TIMESTAMP '2024-01-03 00:00:00'
        |      + to_days(CAST(8 * v.version AS INT)) AS valid_from,
        |    TIMESTAMP '2024-01-03 00:00:00'
        |      + to_days(CAST(8 * (v.version + 1) AS INT)) AS valid_to,
        |    CAST(n_nationkey AS BIGINT) * 100 + v.version AS rate
        |  FROM nation, (SELECT unnest([0, 1, 2]) AS version) v)
        |SELECT e.event_id, e.user_id % 25 AS k, d.rate, d.version
        |FROM events e LEFT JOIN dim d
        |  ON (e.user_id % 25) = d.k
        |  AND e.ts >= d.valid_from AND e.ts < d.valid_to
        |ORDER BY e.event_id""".stripMargin,

    // the banded equi-join answers exactly the theta containment join
    "q_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS band_id,
        |    CAST(n_nationkey AS BIGINT) * 20.0 AS lo,
        |    CAST(n_nationkey AS BIGINT) * 20.0 + 20.0
        |      + (CAST(n_nationkey AS BIGINT) % 3) * 5.0 AS hi
        |  FROM nation)
        |SELECT e.event_id, b.band_id
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |ORDER BY e.event_id, b.band_id""".stripMargin
  )

  /** Non-negative md5 bucket — mirrors [[Sampling.hashBucket]]: top 63
    * bits of md5-lower (unsigned right shift) mod 10000.
    */
  private def bucketExpr: String =
    "((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 1) % 10000)"
}
