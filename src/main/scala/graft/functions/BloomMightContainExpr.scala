package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a string column.
  *
  * The serialized filter travels with the expression (exactly how
  * Spark's own runtime row-level filtering ships its
  * `BloomFilterMightContain` — that expression is internal and keyed to
  * `BloomFilterAggregate`'s xxhash64 encoding, so it cannot be fed from
  * the public `DataFrameStatFunctions.bloomFilter` sketch; this one
  * can). Deserialized once per task via the codegen reference array /
  * a transient lazy val, then probed per row inside whole-stage
  * codegen — a map-side prune with zero shuffle.
  *
  * Byte-compatibility contract: the filter must be built over the SAME
  * UTF-8 bytes that are probed. `BloomFilter.putString`/
  * `mightContainString` hash `String.getBytes(UTF_8)`, and
  * `UTF8String.getBytes` yields those same bytes, so probing with
  * `mightContainBinary(utf8.getBytes)` matches a filter built by
  * `df.stat.bloomFilter` on a string column.
  *
  * Registered per-session as SQL function `graft_bloom_might_contain`
  * by [[graft.operators.TextDedup.decontaminateBloom]].
  *
  * The filter travels as an immutable `ArraySeq[Byte]` (not a raw
  * array) so case-class equality is content-based: Catalyst's
  * canonicalization / common-subexpression elimination can recognize
  * two probes with byte-identical filters as the same expression,
  * which reference-equality on `Array[Byte]` would defeat.
  */
case class BloomMightContainExpr(
    filterBytes: scala.collection.immutable.ArraySeq[Byte],
    child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.unsafeArray
      .asInstanceOf[Array[Byte]]))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bfRef.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}
