package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: build a DataFrame from a
  * custom [[LogicalPlan]] (graft.plans.TopKPerKeyNode). Kept to a single
  * forwarding call so the library's dependence on Spark internals stays
  * auditable in one file.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
