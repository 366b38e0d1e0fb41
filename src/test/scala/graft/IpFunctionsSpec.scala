package graft

import org.apache.spark.sql.functions._

import graft.functions.IpFunctions

class IpFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def ipToIntOf(s: String): Option[Long] =
    Seq(Option(s)).toDF("ip")
      .select(IpFunctions.ipToInt(col("ip")).as("v"))
      .collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }

  test("dotted-quad big-endian conversion (clean_data.py:44-53 semantics)") {
    assert(ipToIntOf("1.2.3.4") === Some(16909060L))
    assert(ipToIntOf("0.0.0.0") === Some(0L))
    assert(ipToIntOf("255.255.255.255") === Some(4294967295L))
    assert(ipToIntOf("192.168.0.1") === Some(3232235521L))
  }

  test("numeric-string fallback via int(float(s)) truncation") {
    assert(ipToIntOf("3232235521") === Some(3232235521L))
    assert(ipToIntOf("3.2e9") === Some(3200000000L))
    assert(ipToIntOf("123.9") === Some(123L))
  }

  test("garbage and out-of-range octets coerce to null, not error") {
    assert(ipToIntOf("not-an-ip") === None)
    assert(ipToIntOf("1.2.3.400") === None) // octet > 255, not a float either
    assert(ipToIntOf(null) === None)
  }

  test("property: intToIp . ipToInt round-trips across uint32 range") {
    val rnd = new scala.util.Random(42)
    val samples = Seq(0L, 1L, 255L, 256L, 65535L, 16777216L, 4294967295L) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 4294967296L)
    val rows = samples.toDF("v")
      .select(col("v"), IpFunctions.ipToInt(IpFunctions.intToIp(col("v"))).as("back"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }
}
