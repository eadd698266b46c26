package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** One shared local session for the whole forked test JVM. */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
}
