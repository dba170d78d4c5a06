package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.flatten.Flattener

/** The flatten operator exposed on the driver's test tables: parse the
  * semi-structured `events.props` JSON into a nested column, then run the
  * full flattening pipeline (ArrayStats + presence pruning + Python-format
  * stringification). The DuckDB oracle reproduces the exact same cells with
  * string functions — Event_id/Event_type pass through PascalCase renaming,
  * `k` becomes `Props_K` with the stringified integer.
  */
object FlattenQueries {

  private def q19(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("props"))
    Flattener.flatten(ev)
  }

  private val q19Sql =
    """SELECT CAST(event_id AS VARCHAR) AS Event_id,
       event_type AS Event_type,
       regexp_extract(props, '"k": ([0-9]+)', 1) AS Props_K
       FROM events"""

  // --- q67: golden-document flatten, pinned byte-for-byte in the driver ----
  // The reference's own sample document (hits envelope, 5,028 leaf paths)
  // through the REAL pipeline (envelope unwrap -> schema discovery ->
  // flatten -> Python-exact stringification), emitted as (path, value)
  // rows for a deterministic 105-path probe subset: every 50th path of
  // the lexicographic column order, plus pinned representatives of each
  // stringification convention (Python 'True'/'False' booleans, missing
  // leaf -> empty string, float repr '1.0133'). The oracle is a VALUES
  // literal generated from the EXECUTED reference's output
  // (src/test/resources/golden_flatten_expected.json), so the driver's
  // hash check compares our cells against the reference's actual bytes,
  // not against a SQL re-derivation. Reference behavior:
  // ElasticSearch ETL.py:131-151 (stringification), :157-163 (envelope).
  private val GoldenDoc = "/root/reference/ElasticSearch_Document.json"

  private val GoldenPaths: Seq[String] = Seq(
    "AdmissionDate",
    "ConfigurationHasMonitoredEdits",
    "IsClaimManuallyProcessed",
    "MedicareConfig_RawClaimOutput_EditOutput_Header_2_EditAdjValue",
    "MedicareConfig_RawClaimOutput_EditOutput_Header_2_EditDisposition",
    "MedicareConfig_RawClaimOutput_EditOutput_Lines_3_Messages_1_EditDisposition",
    "MedicareConfig_RawClaimOutput_PriceOutput_Header_0_Disposition",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_3_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_14_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_29_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_ConfigurationInfo_LesserOfGreaterOfPricers",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_23_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_8_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_18_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_33_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_12_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_28_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_CoveredServiceSeqNo",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_22_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_7_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_17_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_32_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_11_SymbolicName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_27_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_LineNumber",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_21_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_5_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_16_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_30_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_10_DisplayName",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_25_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_FinalPrice",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_1_Value",
    "MedicareConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_4_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_EditOutput_Lines_0_Messages_0_IsAnalyticsOnly",
    "MonitoredEditsConfig_RawClaimOutput_EditOutput_Lines_4_Messages_0_StateCode",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Header_0_FinalPrice",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_4_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_14_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_2_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_Disposition",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_24_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_9_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_19_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_3_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_13_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_29_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_FallbackSeqNo",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_23_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_7_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_18_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_32_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_12_DisplayName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_27_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_Charges",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_21_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_6_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_16_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_31_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_10_Value",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_26_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_PerUnitPrice",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_20_SymbolicName",
    "MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_5_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_ConfigPrice",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_22_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_6_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_17_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_31_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_11_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_26_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_PricerId",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_20_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_5_SymbolicName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_15_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_30_SymbolicName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_0_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_25_SymbolicName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditedPrice",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_1_SymbolicName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_4_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_14_SymbolicName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_2_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_ConfigurationInfo_PricerGroupWithinFallback",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_24_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_8_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_19_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_33_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_13_DisplayName",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_28_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_ConfigurationInfo_FallbackCondition",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_22_Value",
    "PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_7_SymbolicName",
    "UserConfiguration1_RawClaimOutput_FinalConfiguration_ConfigurationNumber",
    "UserConfiguration1_RawClaimOutput_PriceOutput_Lines_11_Messages_0_ConfigurationInfo_IsLesserOfChargesWithinCoveredService",
    "UserConfiguration1_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_PricerGroupWithinFallback",
    "UserConfiguration1_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditedPrice",
    "UserConfiguration1_RawClaimOutput_PriceOutput_Lines_9_Messages_0_MsgText",
    "UserConfiguration2_RawClaimOutput_PriceOutput_Lines_10_Messages_0_ConfigurationInfo_FallbackCondition",
    "UserConfiguration2_RawClaimOutput_PriceOutput_Lines_2_Messages_0_ConfigurationInfo_IsLesserOfChargesWithinCoveredService",
    "UserConfiguration2_RawClaimOutput_PriceOutput_Lines_5_Messages_0_ConfigurationInfo_PricerGroupWithinFallback",
    "UserConfiguration2_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditedPrice")

  private def q67(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flat = Flattener.flatten(graft.sources.EsJson.read(s, GoldenDoc))
    // exactly one golden document: a single bounded row crosses the
    // driver, never the corpus (the distributed path is flattenToTsv)
    val r = flat.first()
    val idx = flat.schema.fieldNames.zipWithIndex.toMap
    val pairs = GoldenPaths.map { p =>
      (p, Option(r.getString(idx(p))).getOrElse(""))
    }
    pairs.toDF("path", "value")
  }

  private val q67Sql =
    """SELECT path, value FROM (VALUES
       ('AdmissionDate', '2024-06-28T00:00:00'),
       ('ConfigurationHasMonitoredEdits', 'True'),
       ('IsClaimManuallyProcessed', 'False'),
       ('MedicareConfig_RawClaimOutput_EditOutput_Header_2_EditAdjValue', '1.0133'),
       ('MedicareConfig_RawClaimOutput_EditOutput_Header_2_EditDisposition', '2'),
       ('MedicareConfig_RawClaimOutput_EditOutput_Lines_3_Messages_1_EditDisposition', '2'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Header_0_Disposition', '8'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_DisplayName', 'Outlier Total For Claim'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_Value', ''),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_3_Value', ''),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_14_DisplayName', 'Medicare Provider Number / CCN'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_29_Value', '0.0000'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_ConfigurationInfo_LesserOfGreaterOfPricers', '[]'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_23_Value', '0.0000'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_8_SymbolicName', 'RuralAdjustmentIndicator'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_18_Value', '0.0000'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_33_SymbolicName', 'Pymnt05854'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_12_Value', 'False'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_28_SymbolicName', 'DeviceDependentHcpcs'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_CoveredServiceSeqNo', '1'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_22_SymbolicName', 'Limit'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_7_DisplayName', 'Quality Reduction Indicator'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_17_SymbolicName', 'DevOffset'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_32_DisplayName', 'MUE Overage Amount'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_11_SymbolicName', 'CondBilateralFlag'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_27_DisplayName', 'Composite APC'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_LineNumber', '7'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_21_DisplayName', 'APC Outlier Threshold'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_5_Value', 'E1'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_16_DisplayName', 'Payment Rate'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_30_Value', ''),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_10_DisplayName', 'Payment Amount'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_25_Value', '168.32'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_FinalPrice', '0.0'),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_1_Value', ''),
       ('MedicareConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_4_SymbolicName', 'OutlierTotalForLine'),
       ('MonitoredEditsConfig_RawClaimOutput_EditOutput_Lines_0_Messages_0_IsAnalyticsOnly', 'True'),
       ('MonitoredEditsConfig_RawClaimOutput_EditOutput_Lines_4_Messages_0_StateCode', 'US'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Header_0_FinalPrice', '1703.83'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_1_Value', ''),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_4_SymbolicName', 'OutlierTotalForLine'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_14_Value', '130049'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_2_SymbolicName', 'OutlierAdjustedCharges'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_Disposition', '2'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_24_SymbolicName', 'Pymnt05853'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_9_DisplayName', 'Composite Indicator'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_19_SymbolicName', 'HoDevCcr'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_3_DisplayName', 'Outlier Shared Percent'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_13_SymbolicName', 'InhBilateralFlag'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_29_DisplayName', 'APC Weight'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_FallbackSeqNo', '1'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_23_DisplayName', 'CMHC Outlier Threshold'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_7_Value', ''),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_18_DisplayName', 'Hospital Cost to Charge Ratio'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_32_Value', ''),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_12_DisplayName', 'Independent Bilateral Flag'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_27_Value', ''),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_Charges', '1300.0'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_21_Value', '1.7500'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_6_SymbolicName', 'ApcGroup'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_16_Value', '0.00'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_31_SymbolicName', 'MueOverageUnits'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_10_Value', '88.0500'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_26_SymbolicName', 'Pymnt00173'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_PerUnitPrice', '88.75'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_20_SymbolicName', 'Fdl'),
       ('MonitoredEditsConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_5_DisplayName', 'APC Status Indicator'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_ConfigPrice', '617.99'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_22_DisplayName', 'APC Outlier Limit'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_0_Messages_0_EditData_6_Value', '5025'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_17_DisplayName', 'Device Offset'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_10_Messages_0_EditData_31_Value', ''),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_11_DisplayName', 'Conditional Bilateral Flag'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_EditData_26_Value', '0.00'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_11_Messages_0_PricerId', '0058'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_20_Value', '0.0000'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_1_Messages_0_EditData_5_SymbolicName', 'APCStatusIndicator'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_15_Value', 'False'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_2_Messages_0_EditData_30_SymbolicName', 'TransitionalOutpatientPaymentTotalPayment'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_0_Value', '1.0133'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditData_25_SymbolicName', 'Pymnt05852'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_3_Messages_0_EditedPrice', '0.0'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_1_SymbolicName', 'OutlierTotalForClaim'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_4_Messages_0_EditData_4_DisplayName', 'Outlier Total For Line'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_14_SymbolicName', 'Oscar'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_5_Messages_0_EditData_2_DisplayName', 'Outlier Adjusted Charges'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_ConfigurationInfo_PricerGroupWithinFallback', '1'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_24_DisplayName', 'Outlier PHP APC Group 05853'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditData_8_Value', ''),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_19_DisplayName', 'Hospital Device Cost to Charge Ratio'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_7_Messages_0_EditData_33_Value', '168.32'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_13_DisplayName', 'Inherent Bilateral Flag'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditData_28_Value', ''),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_ConfigurationInfo_FallbackCondition', '0'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_22_Value', '0.5000'),
       ('PricingOnlyConfig_RawClaimOutput_PriceOutput_Lines_9_Messages_0_EditData_7_SymbolicName', 'QualityReductionIndicator'),
       ('UserConfiguration1_RawClaimOutput_FinalConfiguration_ConfigurationNumber', 'HEMEDICAIDV76'),
       ('UserConfiguration1_RawClaimOutput_PriceOutput_Lines_11_Messages_0_ConfigurationInfo_IsLesserOfChargesWithinCoveredService', 'True'),
       ('UserConfiguration1_RawClaimOutput_PriceOutput_Lines_3_Messages_0_ConfigurationInfo_PricerGroupWithinFallback', '0'),
       ('UserConfiguration1_RawClaimOutput_PriceOutput_Lines_6_Messages_0_EditedPrice', '0.0'),
       ('UserConfiguration1_RawClaimOutput_PriceOutput_Lines_9_Messages_0_MsgText', '[Configuration pricer not found][PricerNotFound=0.00]'),
       ('UserConfiguration2_RawClaimOutput_PriceOutput_Lines_10_Messages_0_ConfigurationInfo_FallbackCondition', '0'),
       ('UserConfiguration2_RawClaimOutput_PriceOutput_Lines_2_Messages_0_ConfigurationInfo_IsLesserOfChargesWithinCoveredService', 'True'),
       ('UserConfiguration2_RawClaimOutput_PriceOutput_Lines_5_Messages_0_ConfigurationInfo_PricerGroupWithinFallback', '0'),
       ('UserConfiguration2_RawClaimOutput_PriceOutput_Lines_8_Messages_0_EditedPrice', '0.0')) AS t(path, value)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_flatten_json" -> q19 _,
    "q67_flatten_golden" -> q67 _)

  val oracle: Map[String, String] = Map(
    "q19_flatten_json" -> q19Sql,
    "q67_flatten_golden" -> q67Sql)
}
