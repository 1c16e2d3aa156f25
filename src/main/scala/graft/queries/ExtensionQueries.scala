package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over `documents`/`embeddings`
  * (builder-prompt scope beyond the reference): dedup family, similarity
  * search, text analysis, multimodal plumbing. Oracles recompute each
  * formula in DuckDB; the probabilistic variants (minhash/simhash/LSH) are
  * rows-only here and verified for recall in OperatorsSpec instead.
  */
object ExtensionQueries {

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

    // --- exact n-gram Jaccard near-dup pairs (bounded slice) -------------
    "dedup_ngram_jaccard" -> { (s, dir) =>
      val d = Tables(s, dir).documents.filter(col("doc_id") < 100)
      Dedup.nearDupPairsExact(d, "doc_id", "text", n = 3, threshold = 0.05)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    },

    // --- minhash-LSH near-dups (probabilistic; rows-only check) ----------
    "dedup_minhash_lsh" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupPairsMinhash(corpus, "doc_id", "text",
          n = 3, bands = 8, rows = 4, threshold = 0.9)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    },

    // --- simhash near-dups (probabilistic; rows-only check) --------------
    "dedup_simhash" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupPairsSimhash(corpus, "doc_id", "text", maxHamming = 3)
        .orderBy(col("a"), col("b"))
    },

    // --- embedding cosine near-dups (bounded query slice) ----------------
    "dedup_embedding" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.embeddingNearDups(
          e, e.filter(col("vec_id") < 50), threshold = 0.75)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("a"), col("b"))
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

    // --- LSH-bucketed top-k (probabilistic recall; rows-only check) ------
    "sim_topk_lsh" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.lshTopK(e, e.filter(col("vec_id") < 20), k = 5, dims = 64)
        .select(col("query_id"), col("rank"), col("nn_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // --- IVF-cell top-k (probabilistic recall; rows-only check) ----------
    "sim_topk_ivf" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), k = 5,
          nCells = 16, nprobe = 4)
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

    // --- document fingerprinting ------------------------------------------
    "text_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
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

    // --- multimodal decode-stub features (rows-only: stub codec) ----------
    "mm_features" -> { (s, dir) =>
      val assets = Tables(s, dir).documents
        .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
          lit("text/plain").as("mime"),
          col("text").cast(BinaryType).as("content"))
      val feats = Multimodal.extractFeatures(assets)
      feats.toDF()
        .select(col("asset_id"), col("byte_len"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy(col("asset_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keeper, COUNT(*) AS n
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS words
        |  FROM documents WHERE doc_id < 100),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(words) < 3
        |      THEN [array_to_string(words, ' ')]
        |      ELSE list_transform(range(1, len(words) - 1),
        |             i -> array_to_string(words[i:i+2], ' ')) END) AS s
        |  FROM w)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
        |        len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
        |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
        |      len(list_distinct(list_concat(x.s, y.s))) >= 0.05
        |ORDER BY a, b""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT q.vec_id AS a, c.vec_id AS b,
        |  round(list_dot_product(q.v, c.v) /
        |        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |FROM e q JOIN e c ON q.vec_id < c.vec_id
        |WHERE q.vec_id < 50
        |  AND list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) >= 0.75
        |ORDER BY a, b""".stripMargin,

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

    "text_langid" -> {
      def hits(lang: String, words: Seq[String]): String = words.map { w =>
        s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ''))) // ${w.length + 2} AS BIGINT)"
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

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id AS asset_id,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS sha256,
        |  upper(substr(hex(encode(text)), 1, 8)) AS magic
        |FROM documents ORDER BY asset_id""".stripMargin
  )
}
