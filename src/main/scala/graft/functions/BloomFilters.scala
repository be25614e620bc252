package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd Catalyst expression
  * — the engine half of semi-join reduction (operators/SemiJoin.scala).
  *
  * Spark 4 ships runtime bloom-filter join reduction
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), but it only injects when
  * the application side's scan exceeds a 10 GB threshold and the creation
  * side sits under its own cap — sized for clusters, so on any local-scale
  * plan (and on sources the optimizer cannot see through: streaming
  * microbatches, mapInPandas stages, DSv2 relations without stats) it
  * never fires. This expression is the explicit form: the caller builds
  * the filter once from the dim side and plants the probe directly in the
  * fact scan's filter, where it prunes BEFORE the exchange.
  *
  * The probe is advisory by construction — false positives pass the bloom
  * and are eliminated by the exact join that follows, so query results
  * are bit-identical with and without the prefilter (both q227 variants
  * share one oracle). Never use it as the final predicate.
  *
  * Codegen embeds the deserialized [[BloomFilter]] as a plan reference
  * object (`ctx.addReferenceObj`, the same mechanism Spark's own
  * `BloomFilterMightContain` uses), so the hot path is a virtual-free
  * `mightContainLong` over the bit array — no UDF boundary, no boxing,
  * and the expression stays inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  // deserialized once per (executor, plan) — `bits` travels with the
  // serialized expression tree, the live filter never re-serializes
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomFilters {

  /** Build a bloom filter over a long key column, serialized for shipping
    * inside an expression tree. Runs as one distributed aggregation
    * (per-partition filters OR-merged on the driver — `DataFrame.stat`'s
    * treeAggregate); driver state is the filter itself, whose size is
    * fixed by (expectedItems, fpp) at build time — ~1.2 MB per 1 M keys
    * at 1% fpp — NOT by the data, the bounded-driver-state contract. */
  def buildLongBloom(df: DataFrame, keyCol: String,
                     expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column-API entry point: `bloom_might_contain(bits, $"l_orderkey")`. */
  def bloom_might_contain(bits: Array[Byte], key: Column): Column =
    Shim.column(BloomMightContain(Shim.expression(key), bits))
}
