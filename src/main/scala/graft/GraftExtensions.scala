package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toResolvableExpression => toExpression}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Sampling, Similarity, TextAnalysis}

/** SQL surface for the engine: registers the custom expressions and the
  * composed scalar operators in the session FunctionRegistry, so a pure
  * `spark.sql(...)` user (or a JDBC/Thrift client) reaches the whole
  * scalar operator suite without touching the Scala API.
  *
  * Wire up with either
  * `--conf spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * (GraftSession / Verify / Bench register it by default, so every
  * oracle query and test session also proves the registration path.)
  *
  * Every builder delegates to the exact Column-API implementation —
  * registration adds names, never a second code path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registerAll(ext)
}

object GraftExtensions {

  private def c(e: Expression) = toColumn(e)

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $e")
  }

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: expected a string literal argument, got $e")
  }

  /** An Aggregator as a registry-returnable AggregateExpression — the
    * same wrapping `functions.udaf(...).apply(cols)` produces on the
    * Column API, so SQL and Column calls plan identically.
    */
  private def udafExpr[IN: scala.reflect.runtime.universe.TypeTag, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      in: Seq[org.apache.spark.sql.Column]): Expression =
    toExpression(org.apache.spark.sql.functions.udaf(agg).apply(in: _*))

  /** name -> (builder, usage) — arity/literal checks live in the builder. */
  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_fingerprint",
      args => toExpression(TextAnalysis.fingerprint(c(args.head))),
      "graft_fingerprint(text) - canonical-form md5 content fingerprint"),
    ("graft_fingerprint64",
      args => toExpression(TextAnalysis.fingerprint64(c(args.head))),
      "graft_fingerprint64(text) - canonical-form xxh64 fingerprint"),
    ("graft_lang_id",
      args => toExpression(TextAnalysis.langId(c(args.head))),
      "graft_lang_id(text) - stopword-marker language id (en/de/es/fr/zh/und)"),
    ("graft_quality_score",
      args => toExpression(TextAnalysis.qualityScore(c(args.head))),
      "graft_quality_score(text) - [0,1] corpus quality score"),
    ("graft_gopher_keep",
      args => toExpression(TextAnalysis.gopherKeep(c(args.head))),
      "graft_gopher_keep(text) - Gopher rule-battery keep verdict"),
    ("graft_scrub_pii",
      args => toExpression(TextAnalysis.scrubPii(c(args.head))),
      "graft_scrub_pii(text) - redact emails/IPv4s/long digit runs"),
    ("graft_token_count",
      args => toExpression(TextAnalysis.wsTokenCount(c(args.head))),
      "graft_token_count(text) - whitespace token count"),
    ("graft_repetition_ratio",
      args => toExpression(TextAnalysis.wordRepetitionRatio(c(args.head))),
      "graft_repetition_ratio(text) - 1 - distinct/total words"),
    ("graft_word_shingles",
      args => graft.functions.WordShingles(args.head, intLit(args(1), "graft_word_shingles")),
      "graft_word_shingles(text, n) - distinct canonical word n-grams"),
    ("graft_minhash_sig",
      args => graft.functions.MinHashSig(args.head, intLit(args(1), "graft_minhash_sig")),
      "graft_minhash_sig(shingles, k) - k-permutation minhash signature"),
    ("graft_simhash64",
      args => graft.functions.SimHash64(args.head),
      "graft_simhash64(text) - 64-bit simhash over word tokens"),
    ("graft_set_jaccard",
      args => graft.functions.SetJaccard(args.head, args(1)),
      "graft_set_jaccard(a, b) - exact Jaccard of two string arrays"),
    ("graft_vec_dot",
      args => graft.functions.VecDot(args.head, args(1)),
      "graft_vec_dot(a, b) - dense double-array dot product"),
    ("graft_cosine",
      args => toExpression(Similarity.cosine(c(args.head), c(args(1)))),
      "graft_cosine(a, b) - cosine similarity of two double arrays"),
    ("graft_nfc",
      args => graft.functions.NfcNormalize(args.head),
      "graft_nfc(s) - Unicode NFC normalization"),
    ("graft_nfkc",
      args => graft.functions.NfkcNormalize(args.head),
      "graft_nfkc(s) - Unicode NFKC normalization (compatibility folding)"),
    ("graft_normalize_url",
      args => toExpression(graft.operators.TextAnalysis.normalizeUrl(c(args.head))),
      "graft_normalize_url(url) - canonical crawl-dedup URL key"),
    ("graft_strip_html",
      args => toExpression(TextAnalysis.stripHtml(c(args.head))),
      "graft_strip_html(html) - blocks/tags stripped, entities decoded, whitespace collapsed"),
    ("graft_fingerprint_nfc",
      args => toExpression(TextAnalysis.fingerprintNfc(c(args.head))),
      "graft_fingerprint_nfc(text) - NFC-composed canonical md5 fingerprint"),
    ("graft_auto_timestamp",
      args => graft.functions.AutoTimestamp(args.head,
        if (args.lengthCompare(1) > 0) strLit(args(1), "graft_auto_timestamp")
        else "UTC"),
      "graft_auto_timestamp(s[, zone]) - 27-layout auto-detected timestamp"),
    ("graft_xxhash64_go",
      args => toExpression(graft.functions.GoHash.goXxHash64(c(args.head))),
      "graft_xxhash64_go(s) - Go cespare/xxhash-parity XXH64 (seed 0)"),
    ("graft_md5_lo",
      args => toExpression(graft.functions.PortableHash.md5Lo(c(args.head))),
      "graft_md5_lo(s) - little-endian low half of md5 (== duckdb md5_number_lower)"),
    ("graft_md5_hi",
      args => toExpression(graft.functions.PortableHash.md5Hi(c(args.head))),
      "graft_md5_hi(s) - little-endian high half of md5 (== duckdb md5_number_upper)"),
    ("graft_hash_bucket",
      args => toExpression(Sampling.hashBucket(c(args.head),
        if (args.lengthCompare(1) > 0) intLit(args(1), "graft_hash_bucket") else 10000)),
      "graft_hash_bucket(key[, buckets]) - deterministic sampling bucket"),
    ("graft_ngram_rep",
      args => toExpression(graft.functions.NgramRepFractions.of(c(args.head),
        if (args.lengthCompare(1) > 0) intLit(args(1), "graft_ngram_rep") else 2,
        if (args.lengthCompare(2) > 0) intLit(args(2), "graft_ngram_rep") else 5)),
      "graft_ngram_rep(text[, topN, dupN]) - struct(top, dup) Gopher n-gram repetition fractions"),
    ("graft_char_entropy",
      args => toExpression(graft.functions.CharEntropy.of(c(args.head))),
      "graft_char_entropy(text) - Shannon entropy (bits/char) of the character distribution"),
    ("graft_luhn_valid",
      args => toExpression(TextAnalysis.luhnValid(c(args.head))),
      "graft_luhn_valid(digits) - Luhn checksum validity of a digit string"),
    ("graft_card_candidates",
      args => toExpression(TextAnalysis.cardCandidates(c(args.head))),
      "graft_card_candidates(text) - 13-19 digit runs (payment-card candidates)"),
    ("graft_ari",
      args => toExpression(TextAnalysis.ariScore(c(args.head))),
      "graft_ari(text) - Automated Readability Index (syllable-free readability)"),

    // ---- aggregate surface: the CH uniq / quantile / sumMap constructs
    // as SQL aggregates (Aggregator-backed, partial-aggregatable —
    // sketch states shuffle, never raw values). Each is the bit-exact
    // twin of the DataFrame operator, pinned by GraftExtensionsSpec.
    ("graft_uniq_hll",
      args => udafExpr(new graft.functions.Aggregates.UniqHllAgg,
        Seq(c(args.head).cast("string"))),
      "graft_uniq_hll(value) - AGGREGATE: HLL approximate count distinct (== ApproxAgg.uniqHll est)"),
    ("graft_quantile_sketch",
      args => {
        val num = intLit(args(1), "graft_quantile_sketch")
        val den = intLit(args(2), "graft_quantile_sketch")
        val scale =
          if (args.lengthCompare(3) > 0) intLit(args(3), "graft_quantile_sketch")
          else 100
        // pre-scale exactly like quantileHistogram: multiply THEN cast,
        // so decimal inputs stay exact and bucket ids are bit-identical.
        // The DECIMAL/integer input guard (float truncate-vs-round drift,
        // scale-divisibility) lives in QuantileSketchInputGuard's
        // checkInputDataTypes, NOT here: the analyzer may invoke this
        // builder before the child resolves (nested views, lateral
        // aliases, subqueries), and a builder-time dataType check would
        // either fail a plan that resolves next fixpoint iteration or
        // silently skip — the resolution-time check is loud on bad input
        // and deferred (never skipped) on early invocation.
        udafExpr(new graft.functions.Aggregates.QuantileSketchAgg(num, den, scale),
          Seq((c(graft.functions.QuantileSketchInputGuard(args.head, scale))
            * scale).cast("long")))
      },
      "graft_quantile_sketch(value, num, den[, scale]) - AGGREGATE: histogram-sketch quantile at num/den; value must be DECIMAL or integer (== ApproxAgg.quantileSketch)"),
    ("graft_sum_map",
      args => udafExpr(new graft.functions.Aggregates.SumMapAgg,
        Seq(c(args.head))),
      "graft_sum_map(m) - AGGREGATE: key-wise MAP<STRING,BIGINT> sum (== MergeSemantics.sumMap)"),
    ("graft_window_funnel",
      args => {
        val winSec = intLit(args(2), "graft_window_funnel").toLong
        val k = intLit(args(3), "graft_window_funnel")
        val mode =
          if (args.lengthCompare(4) > 0) strLit(args(4), "graft_window_funnel")
          else "default"
        udafExpr(
          new graft.functions.Aggregates.WindowFunnelAgg(k, winSec, mode),
          Seq(org.apache.spark.sql.functions
              .unix_micros(c(args.head).cast("timestamp")),
            c(args(1)).cast("int")))
      },
      "graft_window_funnel(ts, step, window_sec, k[, mode]) - AGGREGATE: CH windowFunnel deepest-chain level (== EventAnalytics.windowFunnel)"),
    ("graft_retention",
      args => udafExpr(new graft.functions.Aggregates.RetentionAgg,
        Seq(c(args.head))),
      "graft_retention(flags) - AGGREGATE: CH retention anchor-gated flags over ARRAY<BOOLEAN> (== EventAnalytics.retention)"),
    ("graft_uniq_kmv",
      args => udafExpr(
        new graft.functions.Aggregates.UniqKmvAgg(
          if (args.lengthCompare(1) > 0) intLit(args(1), "graft_uniq_kmv")
          else 256),
        Seq(graft.functions.PortableHash.md5Lo(c(args.head)))),
      "graft_uniq_kmv(value[, k]) - AGGREGATE: KMV approximate count distinct (== ApproxAgg.uniqKmv est)"),
    ("graft_quantile_weighted",
      args => udafExpr(
        new graft.functions.Aggregates.QuantileExactWeightedAgg(
          intLit(args(2), "graft_quantile_weighted"),
          intLit(args(3), "graft_quantile_weighted")),
        Seq(c(args.head).cast("long"), c(args(1)).cast("long"))),
      "graft_quantile_weighted(value, weight, num, den) - AGGREGATE: exact weighted quantile at num/den (== ApproxAgg.quantileExactWeighted)"),
    ("graft_uniq_upto",
      args => udafExpr(
        new graft.functions.Aggregates.UniqUpToAgg(
          intLit(args(1), "graft_uniq_upto")),
        Seq(graft.functions.PortableHash.md5Lo(c(args.head)))),
      "graft_uniq_upto(value, n) - AGGREGATE: exact count distinct while <= n, else n+1 (== ApproxAgg.uniqUpTo)"),
    ("graft_sequence_count",
      args => udafExpr(
        new graft.functions.Aggregates.SequenceCountAgg(
          intLit(args(2), "graft_sequence_count")),
        Seq(org.apache.spark.sql.functions
            .unix_micros(c(args.head).cast("timestamp")),
          c(args(1)).cast("int"))),
      "graft_sequence_count(ts, step, k) - AGGREGATE: CH sequenceCount non-overlapping ordered completions (== EventAnalytics.sequenceCount)")
  )

  def registerAll(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", null, name, usage,
          "", "", "", "", "", "", "built-in"),
        (args: Seq[Expression]) => builder(args)))
    }
}
