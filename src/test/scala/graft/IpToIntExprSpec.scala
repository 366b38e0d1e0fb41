package graft

import org.apache.spark.sql.functions._

import graft.functions.{IpFunctions, IpToIntExpr}

class IpToIntExprSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "1.2.3.4", "0.0.0.0", "255.255.255.255", "192.168.0.1", "01.2.3.4",
    "001.2.3.4", "1.2.3.400", "1.2.3", "1.2.3.4.5", "1..2.3", "",
    "3.2e9", "3232235521", "123.9", "-5", "not-an-ip", "1.2.3.4x",
    " 10.0.0.1 ", "099.1.1.1", "100.200.250.255")

  test("native expression agrees with the pure-Column composition everywhere") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ip_to_int",
      exprs => IpToIntExpr(exprs.head), "scala_udf")
    val df = cases.toDF("ip")
      .withColumn("col_ver", IpFunctions.ipToInt($"ip"))
      .withColumn("native_ver", call_function("graft_ip_to_int", $"ip"))
    val diff = df.filter(
      !($"col_ver" <=> $"native_ver")).collect()
    assert(diff.isEmpty, diff.map(_.toString).mkString("; "))
  }

  test("codegen path evaluates (wholestage on) and interpreted path agrees") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ip_to_int", exprs => IpToIntExpr(exprs.head), "scala_udf")
    val on = cases.toDF("ip")
      .select(call_function("graft_ip_to_int", $"ip")).collect()
    // force interpreted eval
    val expected = cases.map(IpToIntExpr.parseBoxed)
    on.zip(expected).foreach { case (row, exp) =>
      val got = if (row.isNullAt(0)) null else java.lang.Long.valueOf(row.getLong(0))
      assert(got === exp)
    }
  }
}
