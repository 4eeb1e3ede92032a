package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster profile's load-bearing settings — asserted on the BUILDER
  * options (via reflection over the builder's internal option map, no
  * session is started: getOrCreate would collide with the suite's
  * shared session) so a refactor that drops the UTC timezone (every
  * date oracle depends on it), the nanos flag (the events vintage
  * path), or the AQE-skew posture fails here by name instead of as a
  * scattered oracle mismatch on a real cluster.
  */
class SessionsSpec extends AnyFunSuite {

  private def builderOptions(b: AnyRef): Map[String, String] = {
    var cls: Class[_] = b.getClass
    while (cls != null) {
      cls.getDeclaredFields.foreach { f =>
        f.setAccessible(true)
        f.get(b) match {
          case m: scala.collection.mutable.Map[_, _]
            if m.keys.forall(_.isInstanceOf[String]) =>
            return m.map { case (k, v) => k.toString -> v.toString }.toMap
          case _ =>
        }
      }
      cls = cls.getSuperclass
    }
    fail("no option map found on SparkSession.Builder — Spark internals moved")
  }

  test("cluster profile keeps the 100TB posture flags") {
    val opts = builderOptions(
      Sessions.clusterDefaults(org.apache.spark.sql.SparkSession.builder()))
    assert(opts("spark.sql.adaptive.enabled") == "true")
    assert(opts("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(opts("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(opts("spark.sql.shuffle.partitions") == "2000")
    assert(opts("spark.sql.session.timeZone") == "UTC")
    assert(opts("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(opts("spark.sql.autoBroadcastJoinThreshold").toLong == 64L * 1024 * 1024)
    assert(opts("spark.sql.files.maxPartitionBytes") == "256m")
  }
}
