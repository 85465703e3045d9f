import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** The driver contract's query shape: (session, sf dir) => result.
    * See SparkEntry.queries / SURVEY.md §2. */
  type Q = (SparkSession, String) => DataFrame
}
