package graft.model

/** The reference's partition-spec mini-DSL
  * (`HudiSourceConfig.parsePartitionFieldSpecs`, HudiSourceConfig.java:63-86):
  * comma-separated `field:TRANSFORM[:format]`, e.g.
  * `ts:DAY:yyyy-MM-dd,region:VALUE,user_id:BUCKET:16`.
  *
  * For BUCKET the third token is the bucket count.
  */
object PartitionSpecDSL {

  def parse(spec: String): Seq[PartitionFieldSpec] =
    spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(':') match {
        case Array(field) =>
          PartitionFieldSpec(field, Transform.Value)
        case Array(field, t) =>
          requireTransform(t)
          PartitionFieldSpec(field, t.toUpperCase)
        case Array(field, t, arg) =>
          requireTransform(t)
          if (t.equalsIgnoreCase(Transform.Bucket))
            PartitionFieldSpec(field, Transform.Bucket,
              numBuckets = Some(arg.toInt))
          else
            PartitionFieldSpec(field, t.toUpperCase, format = Some(arg))
        case _ => throw new IllegalArgumentException(
          s"bad partition spec element: '$part'")
      }
    }

  private def requireTransform(t: String): Unit =
    require(Transform.all.contains(t.toUpperCase),
      s"unknown transform '$t' (expected ${Transform.all.mkString("/")})")

  def format(specs: Seq[PartitionFieldSpec]): String =
    specs.map { s =>
      val extra = s.numBuckets.map(n => s":$n")
        .orElse(s.format.map(f => s":$f")).getOrElse("")
      s"${s.sourceField}:${s.transform}$extra"
    }.mkString(",")
}
