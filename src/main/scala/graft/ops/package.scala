package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** Driver-contract query shape: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
