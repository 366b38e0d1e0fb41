package graft.functions

import scala.collection.immutable.ArraySeq

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BPE-apply token counter — the scale path past
  * [[graft.operators.TextAnalysis.bpeEncode]]'s 64-merge literal cap.
  *
  * `bpeEncode` inlines each merge as one chained `replace` literal
  * into the expression tree, which is exactly right up to a few dozen
  * merges and structurally impossible at real vocabulary sizes (a 30k
  * merge table would be a tens-of-MB codegen tree). Here the
  * rank-ordered merge table is bound ONCE as a reference-object array
  * (the [[BloomMightContainExpr]] pattern — the literal-table form of
  * a broadcast), and each row applies the merges in a compiled Java
  * loop: thousands of merges, still one narrow shuffle-free
  * projection over the corpus.
  *
  * Merge semantics are bit-identical to `bpeEncode`/`bpeMerges`: each
  * merge rewrites the spaced symbol representation via ONE
  * non-overlapping left-to-right plain `String.replace` of
  * `pattern -> replacement` (`" l r " -> " lr "`), applied in rank
  * order — the same lookahead-free operator in Java and DuckDB, which
  * is what lets a recursive-CTE oracle replay a 1024-rank table
  * exactly.
  *
  * Two granularities share the machinery:
  *   - `wordLevel = false` (character BPE): each whitespace token is
  *     split to spaced characters (`" a b c "`, the `regexp_replace
  *     (w, "(.)", "$1 ")` form bit-for-bit) and encoded on its own;
  *     the result is the SUM of per-word symbol counts. A bounded
  *     concurrent per-task cache memoizes repeated words — vocabulary
  *     is tiny next to the corpus, so most rows are pure lookups.
  *   - `wordLevel = true` (phrase BPE): the whole document is one
  *     symbol sequence (`" w1 w2 ... "`) and merges join adjacent
  *     WORDS into phrases — the phrase-mining shape; merged symbols
  *     use the caller's replacement string (e.g. `"w1_w2"`).
  *
  * Tokenization mirrors [[TextFunctions.tokens]] exactly:
  * `split(trim(lower(text)), "\\s+")` — UTF8String trim/toLowerCase,
  * then a limit −1 regex split, so empty input yields one empty token
  * (count 1), the established harness convention.
  *
  * The tables travel as immutable `ArraySeq[String]` so case-class
  * equality is content-based and Catalyst canonicalization can
  * recognize identical probes (the [[BloomMightContainExpr]]
  * rationale).
  */
case class BpeTokenCountExpr(
    patterns: ArraySeq[String],
    replacements: ArraySeq[String],
    wordLevel: Boolean,
    child: Expression)
    extends UnaryExpression {

  require(patterns.length == replacements.length,
    s"merge table mismatch: ${patterns.length} patterns vs " +
      s"${replacements.length} replacements")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val pats: Array[String] = patterns.toArray
  @transient private lazy val reps: Array[String] = replacements.toArray
  // per-task word memo (char-level only): bounded, thread-safe; the
  // deserialized expression instance is task-local but sharing across
  // threads in local mode is harmless and correct
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Called from generated code — must stay public. */
  def tokenCount(v: UTF8String): Long = {
    val text = v.trim().toLowerCase().toString
    val words = text.split("\\s+", -1)
    if (wordLevel) {
      val sb = new java.lang.StringBuilder(text.length + words.length + 2)
      sb.append(' ')
      var i = 0
      while (i < words.length) {
        sb.append(words(i)).append(' '); i += 1
      }
      applyAndCount(sb.toString)
    } else {
      var total = 0L
      var i = 0
      while (i < words.length) {
        val w = words(i)
        val hit = memo.get(w)
        if (hit != null) total += hit.longValue()
        else {
          val c = applyAndCount(" " + w.replaceAll("(.)", "$1 "))
          if (memo.size() < 65536) memo.put(w, java.lang.Long.valueOf(c))
          total += c
        }
        i += 1
      }
      total
    }
  }

  private def applyAndCount(repr0: String): Long = {
    var r = repr0
    var i = 0
    while (i < pats.length) {
      r = r.replace(pats(i), reps(i)) // JDK no-op (returns this) on miss
      i += 1
    }
    // symbols = single-space-separated segments of the trimmed repr;
    // an empty trimmed repr counts 1 (split(-1) yields [""]) — the
    // same convention as size(split(trim(x), " ")) and the oracle's
    // len(regexp_split_to_array(...))
    val t = r.trim
    var n = 1L
    var j = 0
    while (j < t.length) {
      if (t.charAt(j) == ' ') n += 1L
      j += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpe", this,
      classOf[BpeTokenCountExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.tokenCount($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_token_count"
}
