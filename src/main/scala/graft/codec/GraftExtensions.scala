package graft.codec

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Explode, Expression, ExpressionInfo, Sequence}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, OneRowRelation}

/** Config-driven registration (SURVEY §2's "registered via
  * SparkSessionExtensions"): `--conf
  * spark.sql.extensions=graft.codec.GraftExtensions` makes every graft
  * SQL function (and the `generate_series` table function) available in
  * all sessions of the application — no code call needed, the idiomatic
  * deployment for a cluster-wide library. `GraftFunctions.register`
  * remains for per-session programmatic use. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    val scalar: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "keccak256" -> (es => Keccak256(es.head)),
      "bytes32_to_ascii" -> (es => Bytes32ToAscii(es.head)),
      "checksum_address" -> (es => ChecksumAddress(es.head)),
      "uint_to_decimal_string" -> (es => UintToDecimalString(es.head)),
      "int_to_decimal_string" -> (es => IntToDecimalString(es.head)),
      "wad" -> (es => RescaleToDouble(es.head, 18)),
      "ray" -> (es => RescaleToDouble(es.head, 27)),
      "rad" -> (es => RescaleToDouble(es.head, 45)),
      "wad_s" -> (es => RescaleToDouble(es.head, 18, signed = true)),
      "ray_s" -> (es => RescaleToDouble(es.head, 27, signed = true)),
      "dot_double" -> (es => graft.ops.DotDouble(es(0), es(1))),
      "minhash_agg" -> (es => graft.ops.MinHashAgg(es.head, 64, 1234).toAggregateExpression()),
      "simhash_agg" -> (es => graft.ops.SimHashAgg(es.head).toAggregateExpression()),
      "cms_agg" -> (es => graft.ops.CmsAgg(es.head).toAggregateExpression()),
      "cms_merge_agg" -> (es => graft.ops.CmsMergeAgg(es.head).toAggregateExpression()),
      "cms_estimate" -> (es => graft.ops.CmsEstimate(es(0), es(1))),
      "cms_total" -> (es => graft.ops.CmsTotal(es.head)),
      "hist_agg" -> (es => graft.ops.HistAgg(es.head).toAggregateExpression()),
      "hist_merge_agg" -> (es => graft.ops.HistMergeAgg(es.head).toAggregateExpression()),
      "hist_quantile" -> (es => graft.ops.HistQuantile(es(0), es(1))),
      "hist_oor" -> (es => graft.ops.HistOutOfRange(es.head)),
      "mg_agg" -> (es => graft.ops.MgAgg(es.head).toAggregateExpression()),
      "mg_estimate" -> (es => graft.ops.MgEstimate(es(0), es(1))))
    scalar.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    val series: Seq[Expression] => LogicalPlan = { exprs =>
      val step = if (exprs.size > 2) Some(exprs(2)) else None
      Generate(Explode(new Sequence(exprs(0), exprs(1), step)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil, child = OneRowRelation())
    }
    ext.injectTableFunction(
      (FunctionIdentifier("generate_series"), info("generate_series"), series))
    // manifest-store SQL access (range read + time travel): the SAME
    // builders as the per-session registration — one implementation,
    // two registration paths
    ext.injectTableFunction((FunctionIdentifier("graft_store_range"),
      info("graft_store_range"), GraftFunctions.storeRangeBuilder))
    ext.injectTableFunction((FunctionIdentifier("graft_store_version"),
      info("graft_store_version"), GraftFunctions.storeVersionBuilder))
    ext.injectTableFunction((FunctionIdentifier("graft_store_box"),
      info("graft_store_box"), GraftFunctions.storeBoxBuilder))
  }
}
