package graft.sql

import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for graft's table operations, injected through
  * `SparkSessionExtensions.injectParser` — any statement starting with
  * the word `GRAFT` is parsed here, everything else delegates to Spark's
  * own parser untouched. Grammar (paths are single-quoted strings):
  *
  * {{{
  *   GRAFT OPTIMIZE '<table>' [ZORDER BY (c1, c2, ...)] [WHERE <partition predicate>]
  *   GRAFT VACUUM '<table>' [RETAIN <n> HOURS]
  *   GRAFT RESTORE '<table>' TO VERSION <n>
  *   GRAFT ROLLBACK '<table>' TO SEQUENCE <n>        -- Iceberg
  *   GRAFT DELETE FROM '<table>' WHERE <predicate>   -- any format
  *   GRAFT UPDATE '<table>' SET c = <expr> [, ...] WHERE <predicate>
  *   GRAFT MERGE INTO '<table>' USING '<parquet dir>' ON KEYS (k1, ...)
  *   GRAFT CREATE MATERIALIZED VIEW '<mv>' OVER '<table>' KEYS (...) MEASURES (...)
  *   GRAFT REFRESH MATERIALIZED VIEW '<mv>'
  *   GRAFT CLONE '<src>' TO '<dst>' [AT VERSION <n>] -- Delta shallow clone
  *   GRAFT SYNC PARQUET '<srcdir>' AS <name> TO <delta|iceberg|hudi|paimon> '<target>'
  *   GRAFT CREATE <BRANCH|TAG> <name> ON '<table>' [AT SEQUENCE <n>]
  *   GRAFT DROP <BRANCH|TAG> <name> ON '<table>'
  *   GRAFT <CREATE|REFRESH> BLOOM INDEX ON '<table>' (column)
  *   GRAFT ALTER TABLE '<table>' ADD COLUMN <name> <type> [DEFAULT <lit>]
  *   GRAFT ALTER TABLE '<table>' RENAME COLUMN <a> TO <b>
  *   GRAFT ALTER TABLE '<table>' DROP COLUMN <name>
  *   GRAFT ALTER TABLE '<table>' ALTER COLUMN <name> TYPE <type>
  *   GRAFT ALTER TABLE '<table>' ADD PARTITION FIELD <transform>
  *   GRAFT ALTER TABLE '<table>' DROP PARTITION FIELD <name>
  *   GRAFT ALTER TABLE '<table>' SET TBLPROPERTIES ('format-version'='3')
  *   GRAFT ALTER TABLE '<table>' SET TBLPROPERTIES ('delta.enableRowTracking'='true')
  *   GRAFT SHOW HISTORY '<table>'
  * }}}
  *
  * Each command plans as a `LeafRunnableCommand`
  * ([[GraftSqlCommands]]), so `spark.sql(...)` returns the operation's
  * effect as a normal DataFrame and Spark's command planner executes it
  * — no custom strategy required.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlCommands._

  private val Optimize: Regex =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s*(?:ZORDER\s+BY\s*\(([^)]+)\))?(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val Vacuum: Regex =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s*(?:RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
  private val Restore: Regex =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Rollback: Regex =
    """(?is)\s*GRAFT\s+ROLLBACK\s+'([^']+)'\s+TO\s+SEQUENCE\s+(\d+)\s*;?\s*""".r
  private val Delete: Regex =
    """(?is)\s*GRAFT\s+DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val Update: Regex =
    """(?is)\s*GRAFT\s+UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s*;?\s*""".r
  private val CreateMv: Regex =
    """(?is)\s*GRAFT\s+CREATE\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s+OVER\s+'([^']+)'\s+KEYS\s*\(([^)]+)\)\s+MEASURES\s*\(([^)]+)\)\s*;?\s*""".r
  private val RefreshMv: Regex =
    """(?is)\s*GRAFT\s+REFRESH\s+MATERIALIZED\s+VIEW\s+'([^']+)'\s*;?\s*""".r
  private val Merge: Regex =
    """(?is)\s*GRAFT\s+MERGE\s+INTO\s+'([^']+)'\s+USING\s+'([^']+)'\s+ON\s+KEYS\s*\(([^)]+)\)\s*;?\s*""".r
  private val Clone: Regex =
    """(?is)\s*GRAFT\s+CLONE\s+'([^']+)'\s+TO\s+'([^']+)'\s*(?:AT\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val Sync: Regex =
    """(?is)\s*GRAFT\s+SYNC\s+PARQUET\s+'([^']+)'\s+AS\s+(\w+)\s+TO\s+(\w+)\s+'([^']+)'\s*;?\s*""".r
  private val CreateRef: Regex =
    """(?is)\s*GRAFT\s+CREATE\s+(BRANCH|TAG)\s+(\w+)\s+ON\s+'([^']+)'\s*(?:AT\s+SEQUENCE\s+(\d+))?\s*;?\s*""".r
  private val DropRef: Regex =
    """(?is)\s*GRAFT\s+DROP\s+(?:BRANCH|TAG)\s+(\w+)\s+ON\s+'([^']+)'\s*;?\s*""".r
  private val BloomIdx: Regex =
    """(?is)\s*GRAFT\s+(CREATE|REFRESH)\s+BLOOM\s+INDEX\s+ON\s+'([^']+)'\s*\((\s*\w+\s*)\)\s*;?\s*""".r
  private val AlterAdd: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*;?\s*""".r
  private val AlterAddDefault =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s+DEFAULT\s+(.+?)\s*;?\s*""".r
  private val AlterRename: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val AlterDrop: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  private val AlterType: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*;?\s*""".r
  private val AlterAddPartField: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val AlterDropPartField: Regex =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+PARTITION\s+FIELD\s+(\w+)\s*;?\s*""".r
  private val AlterFormatVersion =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+SET\s+TBLPROPERTIES\s*\(\s*'format-version'\s*=\s*'(\d+)'\s*\)\s*;?\s*""".r
  private val AlterRowTracking =
    """(?is)\s*GRAFT\s+ALTER\s+TABLE\s+'([^']+)'\s+SET\s+TBLPROPERTIES\s*\(\s*'delta\.enableRowTracking'\s*=\s*'(\w+)'\s*\)\s*;?\s*""".r
  private val ShowHistory: Regex =
    """(?is)\s*GRAFT\s+SHOW\s+HISTORY\s+'([^']+)'\s*;?\s*""".r

  /** Split a SET clause on top-level commas (not inside parens/quotes). */
  private[graft] def splitAssignments(s: String): Seq[(String, String)] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          parts += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    parts += s.substring(start)
    parts.result().map { a =>
      val eq = a.indexOf('=')
      require(eq > 0, s"malformed SET assignment: $a")
      (a.substring(0, eq).trim, a.substring(eq + 1).trim)
    }
  }

  /** Split `SET-body WHERE predicate` on the first WHERE keyword that
    * sits OUTSIDE single quotes and parens — a bare regex split would
    * mis-parse a SET value like `n_name = ' where x'`.
    */
  private[graft] def whereSplit(s: String): Option[(String, String)] = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && ch == '(') depth += 1
      else if (!inStr && ch == ')') depth -= 1
      else if (!inStr && depth == 0 && (ch == 'w' || ch == 'W') &&
          i + 5 <= s.length &&
          s.regionMatches(true, i, "WHERE", 0, 5) &&
          (i == 0 || s.charAt(i - 1).isWhitespace) &&
          (i + 5 == s.length || s.charAt(i + 5).isWhitespace))
        return Some((s.substring(0, i).trim, s.substring(i + 5).trim))
      i += 1
    }
    None
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(path, zcols, wpred) =>
      OptimizeCommand(path, Option(zcols).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
        Option(wpred).map(_.trim).filter(_.nonEmpty))
    case Vacuum(path, hours) =>
      VacuumCommand(path, Option(hours).map(_.toLong).getOrElse(168L))
    case Restore(path, v) => RestoreCommand(path, v.toLong)
    case Rollback(path, seq) => RollbackCommand(path, seq.toLong)
    case Delete(path, pred) => DeleteCommand(path, pred)
    case Update(path, body) =>
      whereSplit(body) match {
        case Some((setClause, pred)) =>
          UpdateCommand(path, splitAssignments(setClause), pred)
        case None => throw new IllegalArgumentException(
          "GRAFT UPDATE requires a WHERE clause (outside quotes)")
      }
    case CreateMv(mvPath, tablePath, keys, measures) =>
      MaterializedViewCommand(mvPath, Some((tablePath,
        keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        measures.split(',').map(_.trim).filter(_.nonEmpty).toSeq)))
    case RefreshMv(mvPath) =>
      MaterializedViewCommand(mvPath, None)
    case Merge(path, srcPath, keys) =>
      MergeCommand(path, srcPath,
        keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    case Clone(srcPath, dstPath, v) =>
      CloneCommand(srcPath, dstPath, Option(v).map(_.toLong))
    case Sync(srcPath, name, fmt, tgtPath) =>
      SyncCommand(srcPath, name, fmt, tgtPath)
    case ShowHistory(path) => ShowHistoryCommand(path)
    case AlterRename(path, from, to) =>
      AlterTableCommand(path, graft.sync.AlterTable.RenameColumn(from, to))
    case AlterDrop(path, name) =>
      AlterTableCommand(path, graft.sync.AlterTable.DropColumn(name))
    case AlterType(path, name, ddl) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.AlterColumnType(name, ddl))
    case AlterAddPartField(path, transform) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.AddPartitionField(transform))
    case AlterDropPartField(path, name) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.DropPartitionField(name))
    case AlterFormatVersion(path, v) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.SetFormatVersion(v.toInt))
    case AlterRowTracking(path, v) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.EnableRowTracking(v.equalsIgnoreCase("true")))
    case AlterAddDefault(path, name, ddl, dflt) =>
      AlterTableCommand(path,
        graft.sync.AlterTable.AddColumn(name, ddl, Some(dflt.trim)))
    case AlterAdd(path, name, ddl) =>
      AlterTableCommand(path, graft.sync.AlterTable.AddColumn(name, ddl))
    case BloomIdx(verb, path, column) =>
      BloomIndexCommand(path, column.trim,
        refreshOnly = verb.equalsIgnoreCase("REFRESH"))
    case CreateRef(kind, name, path, seq) =>
      RefCommand(path, kind.toLowerCase, name,
        Option(seq).map(_.toLong), drop = false)
    case DropRef(name, path) =>
      RefCommand(path, "branch", name, None, drop = true)
    case other if other.trim.toUpperCase.startsWith("GRAFT ") =>
      throw new IllegalArgumentException(
        s"unrecognized GRAFT statement: $other — supported: OPTIMIZE, " +
          "VACUUM, RESTORE, ROLLBACK, DELETE FROM, UPDATE, MERGE INTO, " +
          "CLONE, SYNC, CREATE/REFRESH MATERIALIZED VIEW, " +
          "CREATE/REFRESH BLOOM INDEX, ALTER TABLE")
    case other => delegate.parsePlan(other)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Session extensions: register with
  * `.withExtensions(new GraftSparkExtensions)` or
  * `spark.sql.extensions=graft.sql.GraftSparkExtensions`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // SELECT ... FROM t VERSION AS OF / TIMESTAMP AS OF on USING graft
    // catalog tables (the option-based time-travel surface as SQL).
    // Hint-resolution batch: it runs BEFORE ResolveRelations, which
    // throws timeTravelUnsupported for any V1 relation it resolves —
    // a plain resolution rule would never get the node.
    ext.injectHintResolutionRule(session => GraftTimeTravelRule(session))
    // metadata-plane count(*) pushdown over format("graft") scans
    ext.injectOptimizerRule(session =>
      graft.plans.MetadataCountRule(session))
  }
}

/** An extensions-enabled sibling of an existing session, sharing its
  * SparkContext (one per context, cached): the host for
  * `spark.sql("GRAFT ...")` when the primary session was built without
  * extensions. Key SQL confs are mirrored so plans behave identically.
  */
object GraftSql {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()

  def session(base: SparkSession): SparkSession =
    cache.computeIfAbsent(base.sparkContext.applicationId, _ => {
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val b = SparkSession.builder()
          .master(base.sparkContext.master)
          .withExtensions(new GraftSparkExtensions()(_))
        Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone",
          "spark.sql.legacy.parquet.nanosAsLong",
          "spark.sql.adaptive.enabled").foreach { k =>
          base.conf.getOption(k).foreach(b.config(k, _))
        }
        b.getOrCreate()
      } finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    })
}
