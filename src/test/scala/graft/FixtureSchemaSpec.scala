package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift early warning (round-7 postmortem): the driver
  * regenerated /root/testdata mid-round and events.ts silently changed
  * physical type (timestamp[ns]-as-long → timestamp[us]), breaking two
  * queries whose failures only surfaced in the next judge pass. This spec
  * pins the CANONICAL schema [[Tables.load]] presents for every table —
  * if a regeneration changes a physical type the loader doesn't
  * canonicalize away, the breakage gets a named red test in `sbt test`
  * instead of a missing row in the correctness file. */
class FixtureSchemaSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val pinned = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  for (name <- Tables.names) {
    test(s"canonical schema pin: $name") {
      val got = Tables.load(spark, dir, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(got == pinned(name),
        s"fixture drift: $name canonicalizes to\n  $got\nexpected\n  ${pinned(name)}\n" +
          "— either the driver regenerated /root/testdata with new physical " +
          "types (extend Tables.canonicalizeTs) or a loader change altered " +
          "the canonical schema (update this pin deliberately)")
    }
  }
}
