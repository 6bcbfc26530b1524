package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.iceberg._
import graft.model._
import graft.sync.TableFormatSync
import graft.util.Jsons

/** Iceberg partition-spec and schema EVOLUTION (spec v2): real tables keep
  * every historical schema/spec in the metadata arrays and point at the
  * current one via current-schema-id / default-spec-id; manifests keep the
  * spec id they were written under (manifest-list field 502). Reference
  * behavior: iceberg spec §Table Metadata, §Manifest Lists.
  */
class IcebergSpecEvolutionSpec extends SparkSuite {

  /** Stage one parquet file holding `df`'s rows into `dir`, return its
    * FileEntry with the given partition values.
    */
  private def stage(df: DataFrame, dir: String,
      parts: Seq[PartitionMember]): FileEntry = {
    val rows = df.count()
    val tmp = tmpDir("sev_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dir))
    val dst = Paths.get(dir, part.getName)
    Files.move(part.toPath, dst)
    FileEntry(dst.toString, Files.size(dst), rows, "parquet", parts, Nil,
      System.currentTimeMillis())
  }

  private def syncSnap(table: String, schema: StructType,
      specs: Seq[PartitionFieldSpec], files: Seq[FileEntry],
      commit: String): Unit = {
    import spark.implicits._
    val td = TableDescriptor("docs", TableFormats.Parquet, table, schema,
      specs, if (specs.nonEmpty) Layout.HivePartitioned else Layout.Flat,
      System.currentTimeMillis())
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, table)),
      TableSnapshot(td, spark.createDataset(files), commit), "PARQUET")
    assert(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
  }

  private def docs = spark.read.parquet(sf("sf0.001/documents.parquet"))

  private def specIds(listPath: String): Seq[Int] =
    IcebergManifests.readManifestListRecords(listPath)
      .filter(IcebergManifests.contentOf(_) == 0)
      .map(_.get("partition_spec_id").asInstanceOf[Int])

  test("partition-spec change appends a new spec; manifests keep theirs") {
    val table = tmpDir("sev_bump")
    val schema = docs.schema
    val batch1 = docs.select("lang").distinct().collect().map(_.getString(0))
      .sorted.take(2).map { l =>
      stage(docs.filter(col("lang") === l), s"$table/data",
        Seq(PartitionMember("lang", l)))
    }.toSeq
    syncSnap(table, schema,
      Seq(PartitionFieldSpec("lang", Transform.Value)), batch1, "c1")

    val m1 = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    assert(m1.defaultSpecId == 0 && m1.otherSpecs.isEmpty)

    // evolve: partition by source; old files keep only their lang value
    val srcs = docs.select("source").distinct().collect()
      .map(_.getString(0)).sorted.take(2)
    val batch2 = srcs.map { s =>
      stage(docs.filter(col("source") === s), s"$table/data",
        Seq(PartitionMember("source", s)))
    }.toSeq
    syncSnap(table, schema,
      Seq(PartitionFieldSpec("source", Transform.Value)),
      batch1 ++ batch2, "c2")

    val m2 = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    assert(m2.defaultSpecId == 1, s"default-spec-id ${m2.defaultSpecId}")
    assert(m2.otherSpecs.size == 1)
    val oldSpec = Jsons.mapper.readTree(m2.otherSpecs.head)
    assert(oldSpec.get("spec-id").asInt == 0)
    assert(oldSpec.get("fields").get(0).get("name").asText == "lang")
    assert(m2.partitionSpec.map(_.sourceField) == Seq("source"))

    // raw JSON plane: both specs present, ids distinct, last-partition-id
    // is the max field-id across ALL specs (old lang took 1000, the new
    // source field continues at 1001 — never a reused id)
    val raw = Jsons.mapper.readTree(new String(Files.readAllBytes(
      Paths.get(IcebergMetadata.metadataFile(table,
        IcebergMetadata.currentVersion(table).get)))))
    assert(raw.get("partition-specs").size == 2)
    assert(raw.get("default-spec-id").asInt == 1)
    val newFieldId = raw.get("partition-specs").get(1)
      .get("fields").get(0).get("field-id").asInt
    assert(newFieldId == 1001, s"new spec field-id $newFieldId")
    assert(raw.get("last-partition-id").asInt == 1001)

    // manifest list: the carried manifest keeps spec 0, fresh adds get 1
    val ids = specIds(m2.currentSnapshot.get.manifestList).sorted
    assert(ids == Seq(0, 1), s"manifest spec ids $ids")

    // mixed-spec read: identity columns serve from DATA (Flat layout);
    // all rows come back and a filter on the NEW partition column still
    // returns matching rows that live in OLD-spec files
    val src = new IcebergConversionSource(spark, table, "docs")
    assert(src.currentTable().layout == Layout.Flat)
    val expected = batch1.map(_.recordCount).sum + batch2.map(_.recordCount).sum
    assert(src.toDataFrame.count() == expected)
    val oldLangs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).sorted.take(2).toSet
    val wantSrc = srcs.head
    val expectFiltered = docs.filter(col("lang").isin(oldLangs.toSeq: _*) &&
        col("source") === wantSrc).count() +
      docs.filter(col("source") === wantSrc).count()
    val got = src.toDataFrame.filter(col("source") === wantSrc).count()
    assert(got == expectFiltered, s"filtered $got != $expectFiltered")
  }

  test("schema change archives the old schema under its id") {
    val table = tmpDir("sev_schema")
    val schema = docs.schema
    val f1 = stage(docs.limit(50), s"$table/data", Nil)
    syncSnap(table, schema, Nil, Seq(f1), "c1")

    val wider = StructType(schema.fields :+
      StructField("score", DoubleType, nullable = true))
    val f2 = stage(docs.limit(30).withColumn("score", lit(1.5)),
      s"$table/data", Nil)
    syncSnap(table, wider, Nil, Seq(f1, f2), "c2")

    val m = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    assert(m.currentSchemaId == 1, s"current-schema-id ${m.currentSchemaId}")
    assert(m.otherSchemas.size == 1)
    val old = Jsons.mapper.readTree(m.otherSchemas.head)
    assert(old.get("schema-id").asInt == 0)
    assert(!old.get("fields").elements().asScala
      .exists(_.get("name").asText == "score"))
    assert(m.schema.fieldNames.contains("score"))
    // unchanged re-sync does NOT bump again
    syncSnap(table, wider, Nil, Seq(f1, f2), "c3")
    val m2 = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    assert(m2.currentSchemaId == 1 && m2.otherSchemas.size == 1)
  }

  test("reader honors current-schema-id/default-spec-id (current LAST)") {
    val table = tmpDir("sev_read")
    val oldSchema = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lang", StringType))))
    val newSchema = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lang", StringType),
      StructField("source", StringType))))
    // real-writer shape: historical entries FIRST, current LAST
    val json = s"""{
      "format-version": 2,
      "table-uuid": "0c0c0c0c-1111-2222-3333-444444444444",
      "location": "$table",
      "last-sequence-number": 0,
      "last-updated-ms": 1,
      "last-column-id": 3,
      "current-schema-id": 1,
      "schemas": [${IcebergSchemas.toIcebergJson(oldSchema, 0)},
                  ${IcebergSchemas.toIcebergJson(newSchema, 1)}],
      "default-spec-id": 1,
      "partition-specs": [
        {"spec-id":0,"fields":[{"name":"lang","transform":"identity","source-id":2,"field-id":1000}]},
        {"spec-id":1,"fields":[{"name":"source","transform":"identity","source-id":3,"field-id":1001}]}],
      "last-partition-id": 1001,
      "properties": {},
      "current-snapshot-id": -1,
      "snapshots": []
    }"""
    Files.createDirectories(Paths.get(IcebergMetadata.metadataDir(table)))
    Files.write(Paths.get(IcebergMetadata.metadataFile(table, 1)),
      json.getBytes("UTF-8"))
    Files.write(Paths.get(IcebergMetadata.versionHint(table)),
      "1".getBytes("UTF-8"))

    val m = IcebergMetadata.read(table, 1)
    assert(m.currentSchemaId == 1)
    assert(m.schema.fieldNames.toSeq == Seq("id", "lang", "source"),
      s"picked wrong schema: ${m.schema.fieldNames.toSeq}")
    assert(m.defaultSpecId == 1)
    assert(m.partitionSpec.map(_.sourceField) == Seq("source"))
    assert(m.otherSchemas.size == 1 && m.otherSpecs.size == 1)

    // a graft rewrite preserves the full history verbatim
    assert(IcebergMetadata.write(table, 2, m))
    val rt = IcebergMetadata.read(table, 2)
    assert(rt.currentSchemaId == 1 && rt.defaultSpecId == 1)
    assert(rt.otherSchemas.size == 1 && rt.otherSpecs.size == 1)
    val raw = Jsons.mapper.readTree(new String(Files.readAllBytes(
      Paths.get(IcebergMetadata.metadataFile(table, 2)))))
    assert(raw.get("schemas").size == 2)
    assert(raw.get("partition-specs").size == 2)
    assert(raw.get("last-partition-id").asInt == 1001)
  }

  test("manifest compaction groups by spec id, never mixes shapes") {
    val table = tmpDir("sev_compact")
    val schema = docs.schema
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).sorted
    var all = Seq(stage(docs.filter(col("lang") === langs.head).limit(5),
      s"$table/data", Seq(PartitionMember("lang", langs.head))))
    syncSnap(table, schema,
      Seq(PartitionFieldSpec("lang", Transform.Value)), all, "c0")
    // 17 more single-file syncs under the evolved spec drive the list
    // past CompactionThreshold=16 with BOTH specs represented
    (1 to 17).foreach { i =>
      all = all :+ stage(docs.limit(3).withColumn("doc_id",
          col("doc_id") + lit(i * 1000000L)),
        s"$table/data", Seq(PartitionMember("source", s"s$i")))
      syncSnap(table, schema,
        Seq(PartitionFieldSpec("source", Transform.Value)), all, s"c$i")
    }
    val m = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    val recs = IcebergManifests.readManifestListRecords(
      m.currentSnapshot.get.manifestList)
    assert(recs.size <= IcebergConversionTarget.CompactionThreshold + 1,
      s"list not compacted: ${recs.size}")
    val bySpec = specIds(m.currentSnapshot.get.manifestList).distinct.sorted
    assert(bySpec == Seq(0, 1), s"specs in compacted list: $bySpec")
    // the table still serves every row exactly once
    val src = new IcebergConversionSource(spark, table, "docs")
    assert(src.toDataFrame.count() == all.map(_.recordCount).sum)
  }

  test("rename lineage guards: swap, nested, and default-combo shapes " +
    "refuse; plain renames annotate shadows") {
    import graft.formats.iceberg.{IcebergRenames, IcebergSchemas}
    import graft.util.Jsons
    def node(json: String) = Jsons.mapper.readTree(json)
    def schemaJson(fields: String) =
      s"""{"type":"struct","schema-id":1,"fields":[$fields]}"""

    // plain rename: id 2 was 'name', now 'title' -> shadow annotated
    val cur = schemaJson(
      """{"id":1,"name":"id","required":true,"type":"long"},
        |{"id":2,"name":"title","required":false,"type":"string"}"""
        .stripMargin)
    val hist = schemaJson(
      """{"id":1,"name":"id","required":true,"type":"long"},
        |{"id":2,"name":"name","required":false,"type":"string"}"""
        .stripMargin).replace("\"schema-id\":1", "\"schema-id\":0")
    val annotated = IcebergRenames.annotate(
      IcebergSchemas.fromIcebergJson(cur), node(cur), Seq(hist), "/t")
    assert(IcebergRenames.renamedFrom(annotated("title")) == Seq("name"))
    assert(IcebergRenames.renamedFrom(annotated("id")).isEmpty)

    // SWAP: id 1 was 'a' (now 'b'), id 2 was 'b' (now 'a') — an old
    // name that is another live column must refuse
    val curSwap = schemaJson(
      """{"id":1,"name":"b","required":false,"type":"long"},
        |{"id":2,"name":"a","required":false,"type":"long"}"""
        .stripMargin)
    val histSwap = schemaJson(
      """{"id":1,"name":"a","required":false,"type":"long"},
        |{"id":2,"name":"b","required":false,"type":"long"}"""
        .stripMargin).replace("\"schema-id\":1", "\"schema-id\":0")
    val eSwap = intercept[UnsupportedOperationException] {
      IcebergRenames.annotate(IcebergSchemas.fromIcebergJson(curSwap),
        node(curSwap), Seq(histSwap), "/t")
    }
    assert(eSwap.getMessage.contains("ANOTHER live column"),
      eSwap.getMessage)

    // NESTED rename: a struct member's name changed for the same id
    val curNested = schemaJson(
      """{"id":1,"name":"s","required":false,"type":{"type":"struct",
        |"fields":[{"id":2,"name":"y","required":false,"type":"int"}]}}"""
        .stripMargin)
    val histNested = schemaJson(
      """{"id":1,"name":"s","required":false,"type":{"type":"struct",
        |"fields":[{"id":2,"name":"x","required":false,"type":"int"}]}}"""
        .stripMargin).replace("\"schema-id\":1", "\"schema-id\":0")
    val eNested = intercept[UnsupportedOperationException] {
      IcebergRenames.annotate(IcebergSchemas.fromIcebergJson(curNested),
        node(curNested), Seq(histNested), "/t")
    }
    assert(eNested.getMessage.contains("NESTED"), eNested.getMessage)

    // renamed field carrying an initial-default: the existence fill
    // would mask pre-rename files' stored values
    val withDefault = {
      val base = IcebergSchemas.fromIcebergJson(cur)
      org.apache.spark.sql.types.StructType(base.fields.map(f =>
        if (f.name != "title") f
        else f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString("EXISTS_DEFAULT", "'x'").build())))
    }
    val eDef = intercept[UnsupportedOperationException] {
      IcebergRenames.annotate(withDefault, node(cur), Seq(hist), "/t")
    }
    assert(eDef.getMessage.contains("initial-default"), eDef.getMessage)

    // case-only renames need no shadow (Spark parquet resolution is
    // case-insensitive)
    val histCase = cur.replace("\"title\"", "\"TITLE\"")
      .replace("\"schema-id\":1", "\"schema-id\":0")
    val annCase = IcebergRenames.annotate(
      IcebergSchemas.fromIcebergJson(cur), node(cur), Seq(histCase), "/t")
    assert(IcebergRenames.renamedFrom(annCase("title")).isEmpty)
  }
}
