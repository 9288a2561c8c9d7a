package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation, all expressed with
  * codegen'd built-ins so they run inside whole-stage codegen and their
  * semantics can be mirrored 1:1 in an external SQL oracle. */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), " +"))

  /** BPE-ish subword count: words are split every 4 characters (a
    * deterministic stand-in for a real tokenizer's ~4-chars/token rate):
    * ceil(len(word)/4) summed over words. The vocab-driven sibling is
    * [[vocabSubwordFor]]. */
  def subwordCount(text: Column): Column =
    aggregate(split(trim(text), " +"), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))

  /** Planted subword vocabulary for the contract gates (txt07/pack02):
    * hand-cut pieces over the synthetic corpus word pool, chosen so the
    * greedy rules are all exercised on real rows — longest-match ("scan"
    * beats "sc"+"an"), a length-5 piece ("spark"), multi-piece words
    * ("cus|tom|er"), a 1-char piece ("t"), and an unknown-character
    * fallback ("dup" -> "du" + unknown 'p'). */
  val VocabV1: Seq[String] = Seq(
    "the", "a", "ba", "tch", "big", "col", "umn", "cus", "tom", "er",
    "da", "ta", "du", "fas", "t", "fil", "ter", "gro", "up", "ha", "sh",
    "jo", "in", "key", "li", "ne", "mer", "ge", "ord", "par", "que", "ry",
    "row", "scan", "sc", "an", "sl", "ow", "sma", "ll", "so", "rt",
    "spark", "str", "eam", "tab", "le", "val", "ue", "vec", "tor",
    "win", "dow", "agg")

  /** Both vocab paths must see the SAME pieces: the native kernel
    * round-trips the vocab through a comma-CSV literal, so a piece
    * containing a comma would be silently split there while the HOF twin
    * matched it verbatim (review finding) — reject it at the API
    * boundary. Whitespace padding is likewise rejected (the CSV parse
    * trims), and pieces must be BMP-only (the native scan walks UTF-16
    * units; see [[graft.expr.VocabTokensEval.parse]]). */
  private def requireValidVocab(vocab: Seq[String]): Unit = {
    require(vocab.nonEmpty, "vocab must not be empty")
    vocab.foreach { p =>
      require(p.nonEmpty && p.trim == p, s"vocab piece '$p' is empty or has outer whitespace")
      require(!p.contains(","), s"vocab piece '$p' contains a comma (the CSV separator)")
      require(p.codePointCount(0, p.length) == p.length,
        s"vocab piece '$p' contains characters outside the Basic Multilingual Plane")
    }
  }

  /** Vocab-driven greedy longest-match subword count via the native
    * codegen expression (requires [[graft.expr.GraftExtensions]] on the
    * session; see [[graft.expr.VocabTokensEval]] for the exact rules). */
  def vocabSubwordCount(text: Column, vocab: Seq[String]): Column = {
    requireValidVocab(vocab)
    graft.expr.functions.vocab_tokens(text, lit(vocab.mkString(",")))
  }

  /** Bit-identical HOF twin of [[vocabSubwordCount]] for vanilla sessions
    * (the Similarity.cosineFor fallback pattern): pure built-ins, so it
    * needs no extension registration and mirrors into any SQL engine.
    * Greedy matching is a loop, which Spark SQL cannot express directly —
    * so the scan is a FOLD over character indices with the cursor and the
    * running count bit-packed into one long (pos in the high bits, count
    * in the low 20; words up to 2^20 chars — far past any real token).
    * Steps the greedy cursor has already consumed are no-ops. The
    * matching rule per step is the same longest-first `when` chain the
    * native kernel and the DuckDB recursive-CTE oracle use. */
  def vocabSubwordCountHof(text: Column, vocab: Seq[String]): Column = {
    requireValidVocab(vocab)
    val piecesDesc = vocab.distinct.sortBy((p: String) => -p.length)
    aggregate(split(trim(text), " +"), lit(0L),
      (acc, w) => acc + vocabWordFold(w, piecesDesc))
  }

  private def vocabWordFold(w: Column, piecesDesc: Seq[String]): Column = {
    val init = lit(1L << 20) // pos = 1 (1-based), cnt = 0
    val stepped = aggregate(
      // sequence(1, 0) counts DOWN (the txt05 trap): guard empty words
      when(length(w) >= 1, sequence(lit(1), length(w)))
        .otherwise(array().cast("array<int>")),
      init,
      (st, i) => {
        val pos = shiftright(st, 20)
        val cnt = st.bitwiseAND(lit(0xFFFFFL))
        val adv = piecesDesc.foldRight(lit(1L): Column) { (p, els) =>
          when(w.substr(pos.cast("int"), lit(p.length)) === lit(p),
            lit(p.length.toLong)).otherwise(els)
        }
        when(i.cast("long") === pos,
          shiftleft(pos + adv, 20) + cnt + lit(1L)).otherwise(st)
      })
    stepped.bitwiseAND(lit(0xFFFFFL))
  }

  /** Registry-probed selector (the [[Similarity.cosineFor]] pattern): the
    * native codegen kernel when the session carries GraftExtensions, the
    * bit-identical HOF twin otherwise. */
  def vocabSubwordFor(spark: org.apache.spark.sql.SparkSession)
                     (text: Column, vocab: Seq[String]): Column =
    if (spark.catalog.functionExists("vocab_tokens")) vocabSubwordCount(text, vocab)
    else vocabSubwordCountHof(text, vocab)

  /** Intra-document repetition (the Gopher-style duplicate-n-gram quality
    * rule): the fraction of word 3-grams that are repeats of an earlier
    * 3-gram in the same document. Boilerplate, template spam, and
    * degenerate generations score high; natural prose scores near 0.
    * All codegen'd built-ins (sequence/slice/array_distinct) — per-row
    * map-side work, no shuffle, no UDF.
    * @return (id passthrough columns, n_grams, n_distinct, rep_ratio) */
  def repetition(docs: DataFrame, contentCol: String = "content"): DataFrame = {
    val toks = split(trim(col(contentCol)), " +")
    // 1-based slice start i in [1, size-2] => size-2 grams; docs under 3
    // tokens have none (sequence(1, size-2) would count DOWN for size < 3)
    val grams = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    val nGrams = size(grams).cast("long")
    val nDistinct = size(array_distinct(grams)).cast("long")
    docs
      .withColumn("n_grams", nGrams)
      .withColumn("n_distinct", nDistinct)
      .withColumn("rep_ratio",
        when(nGrams > 0, (nGrams - nDistinct).cast("double") / nGrams)
          .otherwise(lit(0.0)))
      .drop(contentCol)
  }

  /** Quality metrics: length, token stats, punctuation & stopword ratios,
    * and a composite 0..1 score (standard web-corpus heuristics: e.g.
    * Gopher rules / C4-style filters, re-expressed as columns). */
  def quality(docs: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = col(contentCol)
    val toks = split(trim(c), " +")
    val nTok = size(toks)
    val nChar = length(c)
    val punct = nChar - length(regexp_replace(c, "[\\.,;:!\\?\\(\\)\\{\\}]", ""))
    val stop = size(filter(toks, t =>
      t.isin("the", "a", "of", "to", "and", "in", "is", "for", "on", "it")))
    docs.withColumn("n_chars_m", nChar)
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        when(nTok > 0, (nChar - (nTok - 1)).cast("double") / nTok).otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChar > 0, punct.cast("double") / nChar).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTok > 0, stop.cast("double") / nTok).otherwise(0.0))
      .withColumn("quality_score",
        when(nTok >= 5 && col("avg_token_len") >= 2 && col("avg_token_len") <= 12 &&
          col("punct_ratio") <= 0.3, 1.0).otherwise(0.0))
  }

  /** N-gram-heuristic language ID: votes from tiny per-language marker
    * lexicons (deterministic, mirrors cleanly to SQL). Returns the argmax
    * language code, 'und' when no marker hits. */
  def langId(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "for"),
      "de" -> Seq("der", "und", "die", "ist", "nicht"),
      "es" -> Seq("el", "la", "que", "los", "por"),
      "fr" -> Seq("le", "la", "les", "est", "dans"),
      "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3"))
    val toks = split(lower(trim(text)), " +")
    val scores = markers.map { case (lang, ws) =>
      (lang, size(filter(toks, t => t.isin(ws: _*))))
    }
    // argmax with first-wins ties in declaration order
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** PII patterns for [[redact]]: kept inside the dialect intersection of
    * Java regex (Spark codegen) and RE2 (DuckDB), so the oracle mirrors
    * match-for-match. Both engines count/replace NON-OVERLAPPING matches
    * left to right. Phone is the NANP dashed form (the unambiguous shape
    * every scrub list starts with); IPv4 is the plain dotted quad. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val PhoneRe = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII-style scrubbing for training corpora: counts and redacts email
    * addresses, URLs, dashed phone numbers, and IPv4 addresses (the
    * C4/CCNet-style cleanup step). Counts are taken on the ORIGINAL text;
    * redaction is sequential (emails, then URLs, then phones, then IPs —
    * the order matters: an IP inside a URL is already `<URL>` by the time
    * the IP pass runs, so it is counted once but redacted as part of the
    * URL). Pure codegen'd regexp built-ins — per-row map-side work, no
    * UDF, SQL-mirrorable.
    * @return input columns (minus content) + n_emails, n_urls, n_phones,
    *         n_ips, redacted */
  def redact(docs: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = col(contentCol)
    def count(re: String) = size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    docs
      .withColumn("n_emails", count(EmailRe))
      .withColumn("n_urls", count(UrlRe))
      .withColumn("n_phones", count(PhoneRe))
      .withColumn("n_ips", count(Ipv4Re))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, EmailRe, "<EMAIL>"),
              UrlRe, "<URL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
      .drop(contentCol)
  }

  /** Token-level sequence packing (the GPT-style pretraining prep step):
    * documents are deterministically hash-sharded, concatenated within
    * each shard in id order, and the token stream is cut every
    * `chunkTokens` tokens — chunks straddle document boundaries by
    * design. Emits, per document, where its tokens land:
    * (id, shard, n_tokens, start_tok, first_chunk, last_chunk).
    *
    * Scale shape: packing is inherently a sequential fold over the
    * concat order, so parallelism comes from sharding — ONE shuffle by
    * shard, then a per-shard running-sum window; pick `shards` at 2-4x
    * total cores and hash-sharding keeps them balanced (each task holds
    * ~corpus/shards rows — this mirrors how per-worker packing runs in
    * production loaders). Deterministic like [[Sampling.stratified]]:
    * shard and order are pure functions of the id, so the chunk layout
    * is stable under repartitioning and re-runs, and `shards` must be a
    * power of two so the mask agrees under signed and unsigned hash
    * interpretation (the samp01 convention). Tokens default to
    * [[subwordCount]]'s deterministic ~4-chars/token stand-in — pass
    * `vocab` for the greedy longest-match tokenizer ([[vocabSubwordFor]]).
    * Zero-token documents are excluded (they occupy no stream positions).
    * Requires `splitmix64` on the session ([[graft.expr.GraftExtensions]]).
    *
    * @param orderSeed when set, documents are GLOBALLY SHUFFLED before
    *   packing: within-shard concat order becomes the unsigned
    *   splitmix64(id XOR orderSeed) order instead of id order — the
    *   mixing step every production loader runs so consecutive training
    *   chunks don't replay ingest order. Still a pure function of ids:
    *   same determinism, same one-shuffle plan, just a different sort key
    *   inside the same window. */
  def packChunks(docs: DataFrame, idCol: String, contentCol: String,
                 chunkTokens: Int, shards: Int, seed: Long = 42L,
                 vocab: Option[Seq[String]] = None,
                 orderSeed: Option[Long] = None): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(shards > 0 && (shards & (shards - 1)) == 0, "shards must be a power of two")
    Sampling.requireHashableId(docs, idCol) // fail fast, not ANSI-throw mid-job
    val spark = docs.sparkSession
    val shard = graft.expr.functions
      .splitmix64(col(idCol).cast("long").bitwiseXOR(lit(seed)))
      .bitwiseAND(lit(shards - 1L))
    val tokens = vocab.map(v => vocabSubwordFor(spark)(col(contentCol), v))
      .getOrElse(subwordCount(col(contentCol)))
    // sign-bit flip: ascending signed sort == ascending UNSIGNED hash
    // order (the samp02 convention, mirrored by the oracle's UBIGINT sort)
    val mix = orderSeed.map(os => graft.expr.functions
      .splitmix64(col("id").bitwiseXOR(lit(os)))
      .bitwiseXOR(lit(Long.MinValue)))
    val orderCols = mix.toSeq :+ col("id")
    val w = Window.partitionBy("shard").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col(idCol).cast("long").as("id"), shard.as("shard"),
        tokens.as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("id"), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_tok"),
        expr(s"(cum - n_tokens) div ${chunkTokens}L").as("first_chunk"),
        expr(s"(cum - 1) div ${chunkTokens}L").as("last_chunk"))
  }

  /** Corpus-level top-k most repeated word n-grams — the statistics
    * operator behind boilerplate discovery (it's how you would CHOOSE
    * [[Dedup.paragraphSpans]]'s window, audit a scrape for template
    * chrome, or build a stop-gram list for
    * [[Dedup.ngramContamination]]). Counts are total occurrences
    * (within-document repeats included) plus the distinct-document
    * count; deterministic order (occurrences desc, then gram) makes the
    * k-boundary stable.
    *
    * Scale shape: explode to skinny (id, gram) rows, ONE
    * map-side-combinable groupBy (count + exact distinct-id count —
    * the dd08 discipline), and the top-k is `orderBy.limit`, which
    * Spark executes as TakeOrderedAndProject (per-partition top-k
    * merged on the driver — k rows, never a global sort). */
  def topNgrams(docs: DataFrame, contentCol: String = "content",
                idCol: String = "id", n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1)
    val words = split(col(contentCol), " ")
    val grams = when(size(words) >= n,
      transform(sequence(lit(1), size(words) - n + 1),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("id"), explode(grams).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("occurrences"), countDistinct(col("id")).as("n_docs"))
      .orderBy(col("occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Per-domain URL statistics — the aggregation behind C4-style domain
    * filtering (block-lists, per-domain caps, source-mix reports): every
    * URL in every document is reduced to its host, then ONE
    * map-side-combinable groupBy yields total mentions and distinct
    * citing documents per domain. The URL->host extraction is a single
    * codegen'd regexp (Java/RE2 dialect intersection, like [[redact]]'s
    * patterns), so the whole operator is one scan + one combinable
    * shuffle of skinny (domain, id) rows. */
  val UrlHostRe = "https?://([^/ ]+)"

  def domainStats(docs: DataFrame, contentCol: String = "content",
                  idCol: String = "id"): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(contentCol), lit(UrlHostRe), lit(1))).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("id")).as("n_docs"))

  /** Canonical form of a URL for URL-level dedup (the CCNet/C4 crawl
    * convention): fragment dropped, scheme+host lowercased (path stays
    * case-sensitive), tracking params (utm_*, fbclid, gclid) stripped,
    * dangling `?`/`&` separators trimmed. Pure codegen'd regexp/string
    * built-ins in the Java∩RE2 dialect intersection — in particular NO
    * replacement backreferences (Java spells them `$1`, RE2 `\1`), which
    * is why the tracking-param strip consumes the FOLLOWING separator
    * (`...&?`) instead of rewriting the leading one. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val host = regexp_extract(noFrag, "(?i)^(https?://[^/?#]*)", 1)
    val lowered = concat(lower(host), noFrag.substr(length(host) + 1, length(noFrag)))
    val noTrack = regexp_replace(lowered, "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    regexp_replace(noTrack, "[?&]+$", "")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text
    * (near-dup-stable normalization + hash; SQL-mirrorable). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Rolling polynomial 64-bit fingerprint over tokens (the Rabin-style
    * rolling hash; Scala-side, for streaming/chunked fingerprinting where
    * md5-of-whole-doc is not applicable). */
  def rollingFingerprint(text: String, seed: Long = 42L): Long = {
    var h = seed ^ 0xCBF29CE484222325L
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) h = h * 0x100000001B3L + Hashing.hashString(text.substring(start, i), seed)
        start = i + 1
      }
      i += 1
    }
    Hashing.splitmix64(h)
  }
}
