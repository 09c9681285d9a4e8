package graft.model

import org.apache.spark.sql.types._

/** Pinned schemas for the CTA Train-Tracker pipeline.
  *
  * The reference infers every schema dynamically (pyarrow from dicts,
  * reference bucket_raw_data.py:58) and enforces shape only through a live
  * contract test (reference tests/integration/test_cta_api_response.py:20-40).
  * We pin explicit StructTypes instead and treat drift as an error —
  * SURVEY.md §1.3/§1.4.
  */
object CtaSchemas {

  /** D1 — nested Train-Tracker API response (reference
    * get_train_status.py:104-110; shape documented by the public CTA API and
    * mirrored in tests/helper_files/mock_train_location_response.py:1-31).
    * All leaf values are strings on the wire (reference
    * tests/integration/test_cta_api_response.py:26-40).
    */
  private val trainStruct: StructType = StructType(
    Seq("rn", "destSt", "destNm", "trDr", "nextStaId", "nextStpId",
      "nextStaNm", "prdt", "arrT", "isApp", "isDly", "flags", "lat", "lon",
      "heading").map(StructField(_, StringType)))

  private val routeStruct: StructType = StructType(Seq(
    StructField("@name", StringType),
    StructField("train", ArrayType(trainStruct))))

  val apiResponse: StructType = StructType(Seq(
    StructField("ctatt", StructType(Seq(
      StructField("tmst", StringType),
      StructField("errCd", StringType),
      StructField("errNm", StringType),
      StructField("route", ArrayType(routeStruct)))))))

  /** D2/D3 — the landed raw record, all strings, exactly the 8 fields the
    * reference keeps (get_train_status.py:111-122) plus the geo fields it
    * drops (we keep them for analytics — SURVEY.md §1.2).
    */
  val rawRecord: StructType = StructType(Seq(
    StructField("train_id", StringType),
    StructField("current_timestamp", StringType),
    StructField("prediction_generated_timestamp", StringType),
    StructField("destination_station", StringType),
    StructField("next_station", StringType),
    StructField("next_station_arrival_time", StringType),
    StructField("is_approaching_station", StringType),
    StructField("is_train_delayed", StringType),
    StructField("lat", StringType),
    StructField("lon", StringType),
    StructField("heading", StringType)))

  /** D4 — typed observation: timestamps/booleans/doubles cast once at the
    * ingest edge (SURVEY.md §7.4), composite key kept decomposed. */
  val observation: StructType = StructType(Seq(
    StructField("train_id", StringType),
    StructField("service_date", DateType),
    StructField("line", StringType),
    StructField("run", StringType),
    StructField("direction", StringType),
    StructField("observed_at", TimestampType),
    StructField("prediction_generated_at", TimestampType),
    StructField("destination_station", StringType),
    StructField("next_station", StringType),
    StructField("next_station_arrival_at", TimestampType),
    StructField("is_approaching_station", BooleanType),
    StructField("is_train_delayed", BooleanType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("heading", DoubleType),
    StructField("load_date", DateType)))

  /** The 7-line static dimension (reference write_train_lines.py:25-33). */
  val trainLines: Seq[(String, String)] = Seq(
    "Red" -> "Red Line", "Blue" -> "Blue Line", "Brn" -> "Brown Line",
    "G" -> "Green Line", "Org" -> "Orange Line", "P" -> "Purple Line",
    "Y" -> "Yellow Line")
}
