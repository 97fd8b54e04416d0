import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A declared query: (session, scale-factor dir) ⇒ result frame.
    * Contract shape fixed by the driver (SparkEntry.queries). */
  type QueryFn = (SparkSession, String) => DataFrame
}
