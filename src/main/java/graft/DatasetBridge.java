package graft;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;

/**
 * Bridge to {@code Dataset.ofRows} — the constructor for a DataFrame over
 * a custom LogicalPlan (our native operator nodes, see
 * graft.plans.AsOfJoinPlan). Like {@link CatalystBridge}, the Spark 4
 * "classic" API is {@code private[sql]} to Scala but public JVM bytecode,
 * so a Java call-through keeps us on the supported path without opening
 * Spark's namespace.
 */
public final class DatasetBridge {
    private DatasetBridge() {}

    public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
        return org.apache.spark.sql.classic.Dataset.ofRows(
            (org.apache.spark.sql.classic.SparkSession) spark, plan);
    }
}
