package graft;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.classic.ExpressionUtils;

/**
 * Bridge between the public Column API and catalyst Expressions.
 *
 * Spark 4 moved Column construction behind
 * {@code org.apache.spark.sql.classic.ExpressionUtils}, which is
 * {@code private[sql]} to Scala but public JVM bytecode; calling through
 * Java keeps our custom codegen-friendly expressions (StaticInvoke wrappers,
 * see graft.flatten.PyFormat) on the supported classic path without
 * polluting Spark's namespace.
 */
public final class CatalystBridge {
    private CatalystBridge() {}

    public static Column column(Expression e) {
        return ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return ExpressionUtils.expression(c);
    }
}
