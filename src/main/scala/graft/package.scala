import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Driver contract query shape: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
