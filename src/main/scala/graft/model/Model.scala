package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** Case-class schemas mirroring the reference POCOs (SURVEY.md §1.2).
  * Quirks preserved on purpose: stringly `Date`/`Done` (SampleItem.cs:10-12),
  * UUID-as-string ids (Spark has no native UUID), and the `AdditionlInfo`
  * typo in the run-audit record (OrchestrationRun.cs:17 — wire fidelity).
  */

/** SampleItem.cs:7-17 — the raw extracted document. */
final case class SampleItem(
    id: String,
    Date: String,
    Desc: String,
    Done: String,
    Name: String,
    Pr: String,
    LogicalPartition: String)

/** TransformedItem.cs:7-20 — output of the Transform projection. */
final case class TransformedItem(
    id: String,
    SourceDate: String,
    TransformTimeStamp: Timestamp,
    Description: String,
    Done: String,
    Name: String,
    Pr: String,
    AdditionalData: String,
    TransformBatch: String,
    UpdateLocation: String)

/** OrchestrationRun.cs:7-18 — one audit row per finished run. */
final case class OrchestrationRun(
    id: String,
    StartTime: Timestamp,
    EndTime: Timestamp,
    Duration: Double,
    ForcedLease: Boolean,
    Succeeded: Boolean,
    OrchestrationWorker: String,
    AdditionlInfo: String)

object Model {
  val sampleItemSchema: StructType = Encoders.product[SampleItem].schema
  val transformedItemSchema: StructType = Encoders.product[TransformedItem].schema
  val orchestrationRunSchema: StructType = Encoders.product[OrchestrationRun].schema
}
