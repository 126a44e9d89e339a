package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashAgg, ShingleHashes, SimHashAgg, TopKPairsAgg, VecDot, VecDotI, VecL2I, WindowHashes}

/** Session extensions — the supported injection point for the engine's
  * custom Catalyst surface. Installing via
  * `spark.sql.extensions=graft.GraftExtensions` makes the functions
  * first-class in every session of the application (including
  * thrift/connect servers), where the per-session `register` helpers only
  * patch one registry. Also injects the engine's optimizer rule
  * ([[graft.plans.DerivePartitionGuards]]) into the operator-optimization
  * batch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.DerivePartitionGuards)
    // group filtering for conditioned NOT-MATCHED-BY-SOURCE merges: runs
    // in the operator-optimization batch, one batch BEFORE Spark's
    // RowLevelOperationRuntimeGroupFiltering consumes what it synthesizes
    ext.injectOptimizerRule(_ => graft.plans.BoundBySourceMerge)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_l2i"),
      new ExpressionInfo(classOf[VecL2I].getName, "vec_l2i"),
      (es: Seq[Expression]) => VecL2I(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_doti"),
      new ExpressionInfo(classOf[VecDotI].getName, "vec_doti"),
      (es: Seq[Expression]) => VecDotI(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashAgg(es.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_sig"),
      (es: Seq[Expression]) => SimHashAgg(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head, 3)))
    ext.injectFunction((
      FunctionIdentifier("window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "window_hashes"),
      (es: Seq[Expression]) =>
        WindowHashes(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairsAgg].getName, "topk_pairs"),
      (es: Seq[Expression]) =>
        TopKPairsAgg(es.head, es(1), es(2).eval().asInstanceOf[Number].intValue())))
    // Spark's OWN bloom-filter expressions (the pair behind runtime join
    // filters — spark/sql/catalyst/expressions/aggregate/BloomFilterAggregate
    // .scala), surfaced as callable functions so an application-level bloom
    // (build over a small relation, prune a huge one map-side) can be
    // planned explicitly; see graft.functions.BloomOps.
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es.head, es(1), es(2))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es.head, es(1))))
  }
}
