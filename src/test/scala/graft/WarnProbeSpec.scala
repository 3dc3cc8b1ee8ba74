package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the [[WarnProbe]] runtime gate actually captures Spark's
  * global-window warning: the log4j2 appender must record a hit when a
  * deliberately unpartitioned window executes, and stay silent for the
  * partitioned spelling. Without this pin the gate could silently rot
  * (e.g. a Spark upgrade rewording the log line) while still exiting 0
  * — exactly the "manual step gets skipped" failure mode it exists to
  * close. */
class WarnProbeSpec extends SparkSpec {

  test("probe appender records an unpartitioned-window execution and only that") {
    import spark.implicits._
    // the shared test session's log level is suite-order-sensitive state:
    // capture it and restore after, so this test can't change logging
    // behavior for suites that happen to run later in the same JVM
    val prevLevel = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel
    // events below WARN are filtered at the logger before any appender
    // sees them; WarnProbe.main sets the same level for the real run
    spark.sparkContext.setLogLevel("WARN")
    try {
      val hits = WarnProbe.attachProbe()
      val df = (1L to 100L).toDF("x")
      hits.clear()
      df.withColumn("r", row_number().over(Window.orderBy($"x")))
        .write.format("noop").mode("overwrite").save()
      assert(!hits.isEmpty,
        "global window executed but the probe captured no warning — the " +
          "WarnProbe gate is blind (marker string or appender wiring broke)")
      hits.clear()
      df.withColumn("r", row_number().over(
        Window.partitionBy($"x" % 2).orderBy($"x")))
        .write.format("noop").mode("overwrite").save()
      assert(hits.isEmpty,
        s"partitioned window tripped the probe: ${hits.peek()}")
    } finally spark.sparkContext.setLogLevel(prevLevel.toString)
  }
}
