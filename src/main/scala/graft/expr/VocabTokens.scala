package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[VocabTokens]]: greedy longest-match subword tokenization
  * against a fixed piece vocabulary — the deterministic core of BPE/
  * WordPiece-style *counting* (no merges are learned here; the vocab is an
  * input, as it is at inference time in a real loader). Semantics shared
  * verbatim with the DuckDB oracle CTE and the HOF twin
  * ([[graft.ops.TextAnalysis.vocabSubwordCountHof]]):
  *
  *  - words are maximal runs of non-space characters (the
  *    `split(trim(text), " +")` shape used by every text operator here);
  *  - within a word, scan left to right: at each position consume the
  *    LONGEST vocab piece that matches exactly, count 1;
  *  - no piece matches -> the single character is its own token
  *    (the unknown/byte-fallback rule), count 1, advance 1.
  *
  * The probe is a linear pass over length-descending pieces — right for
  * the planted test vocab (~50 pieces). A production 50k-piece vocab
  * swaps in a first-char-indexed trie; the expression surface and the
  * oracle are unchanged. */
object VocabTokensEval {

  /** Parse a comma-separated vocab into distinct pieces, longest first
    * (so the first match in scan order IS the longest match). Pieces must
    * be BMP-only: the scan walks UTF-16 char indices, and a BMP-only
    * vocab makes char-advance == codepoint-advance for matches (a BMP
    * char never equals half a surrogate pair, so a piece can't match
    * mid-codepoint) — which is what keeps this kernel bit-identical to
    * the codepoint-based HOF twin and DuckDB oracle (review finding). */
  def parse(csv: String): Array[String] = {
    val pieces = csv.split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .toArray.distinct.sortBy((p: String) => -p.length)
    require(pieces.forall(p => p.codePointCount(0, p.length) == p.length),
      "vocab pieces must not contain characters outside the Basic Multilingual Plane")
    pieces
  }

  def count(text: UTF8String, piecesDesc: Array[String]): Long =
    count(text.toString, piecesDesc)

  def count(text: String, piecesDesc: Array[String]): Long = {
    var total = 0L
    val n = text.length
    var i = 0
    while (i < n) {
      if (text.charAt(i) == ' ') i += 1
      else {
        var end = i
        while (end < n && text.charAt(end) != ' ') end += 1
        total += countWord(text, i, end, piecesDesc)
        i = end
      }
    }
    total
  }

  private def countWord(text: String, start: Int, end: Int,
                        piecesDesc: Array[String]): Long = {
    var pos = start
    var cnt = 0L
    while (pos < end) {
      var adv = 0
      var k = 0
      while (k < piecesDesc.length && adv == 0) {
        val p = piecesDesc(k)
        if (pos + p.length <= end && text.startsWith(p, pos)) adv = p.length
        k += 1
      }
      // unknown fallback advances one CODEPOINT, not one UTF-16 unit: a
      // supplementary character (surrogate pair) is ONE unknown token —
      // matching the codepoint semantics of the HOF twin (Spark
      // length/substr) and the DuckDB oracle (review finding: charAt
      // advance counted an emoji as 2 tokens)
      if (adv == 0) adv = Character.charCount(text.codePointAt(pos))
      pos += adv
      cnt += 1
    }
    cnt
  }
}

/** `vocab_tokens(text, vocab_csv)`: greedy longest-match subword token
  * count over a literal piece vocabulary (see [[VocabTokensEval]]) — the
  * production-shaped replacement for the 4-chars/token stand-in in
  * [[graft.ops.TextAnalysis.subwordCount]]. The vocab argument must be a
  * foldable (literal) string: it is parsed ONCE at plan time and shipped
  * as a codegen reference object, the same way a broadcast vocabulary
  * reaches executors in a real tokenizing pipeline. */
case class VocabTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vocab_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable string vocab csv), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}" +
        (if (right.dataType == StringType && !right.foldable)
          " (vocab must be a literal)" else ""))

  @transient private lazy val pieces: Array[String] = {
    val v = right.eval()
    if (v == null) Array.empty
    else VocabTokensEval.parse(v.asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(t: Any, v: Any): Any =
    VocabTokensEval.count(t.asInstanceOf[UTF8String], pieces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabPieces", pieces, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expr.VocabTokensEval.count($t, $ref);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}
