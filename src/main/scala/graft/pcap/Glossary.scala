package graft.pcap

import scala.io.Source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The tshark data dictionary, from a checked-in snapshot.
  *
  * Mirrors the reference's `glossary_protocols` / `glossary_fields` tables
  * (reference `src/wireduck_extension.cpp:278-284`, `:346-353`), normally
  * populated by parsing `tshark -G protocols` / `tshark -G fields` at load
  * time (`:288`, `:357`). tshark is absent in this environment, so the
  * snapshot TSVs (same column shapes as the tshark -G output the reference
  * parses) are bundled as resources; when tshark IS installed,
  * [[Glossary.fromTshark]] regenerates them live (reference A8 semantics).
  */
object Glossary {

  final case class Protocol(
      full_name: String,
      short_name: String,
      filter_name: String,
      can_enable: Boolean,
      is_displayed: Boolean,
      is_filterable: Boolean)

  final case class Field(
      field_name: String,
      filter_name: String,
      field_type: String,
      protocol_filter_name: String,
      encoding: String,
      bitmask: String,
      description: String)

  /** tshark FT_* → Spark type, exactly the reference's 5-type collapse
    * (`MapTsharkTypeToDuckDB`, reference `src/wireduck_extension.cpp:37-51`):
    * any INT/UINT width → BIGINT, float/double → DOUBLE, boolean → BOOLEAN,
    * absolute/relative time → TIMESTAMP, everything else → VARCHAR. */
  def sparkType(ftType: String): DataType = {
    if (ftType.contains("UINT") || ftType.contains("INT")) LongType
    else if (ftType == "FT_FLOAT" || ftType == "FT_DOUBLE") DoubleType
    else if (ftType == "FT_BOOLEAN") BooleanType
    else if (ftType == "FT_ABSOLUTE_TIME" || ftType == "FT_RELATIVE_TIME") TimestampType
    else StringType
  }

  private def resourceLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource /graft/$name")
    try Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  lazy val protocols: Seq[Protocol] = resourceLines("glossary_protocols.tsv").map { l =>
    val c = l.split("\t", -1)
    Protocol(c(0).trim, c(1).trim, c(2).trim, c(3) == "T", c(4) == "T", c(5) == "T")
  }

  /** Fields in glossary (registration) order — this order IS the schema
    * column order contract (reference `:53-78`, README DESCRIBE golden). */
  lazy val fields: Seq[Field] = resourceLines("glossary_fields.tsv").collect {
    case l if l.startsWith("F\t") => // reference keeps only 'F' rows (:368-375)
      val c = l.split("\t", -1)
      Field(c(1).trim, c(2).trim, c(3).trim, c(4).trim, c(5).trim, c(6).trim, c(7).trim)
  }

  private lazy val byFilterName: Map[String, Field] =
    fields.map(f => f.filter_name -> f).toMap

  /** The 5 ever-present default columns (reference `:63`), frame fields
    * first, `_ws.col.info` last (README DESCRIBE order). */
  val defaultFrameFields: Seq[String] =
    Seq("frame.time_epoch", "frame.number", "frame.len", "frame.protocols")
  val infoField = "_ws.col.info"

  /** The LIVE dictionary, parsed lazily (once per JVM) from `tshark -G
    * fields` — the reference's actual load-time source (`:288`, `:357`).
    * Consulted ONLY for protocols absent from the snapshot TSVs, and only
    * when a tshark binary exists; offline it is empty and the snapshot
    * rows remain the whole dictionary. This closes the structural gap
    * between the 1.3k-field snapshot and tshark's full ~3k-protocol /
    * 100k+-field registry: on a tshark host, `backend=tshark` schema
    * requests for ANY dissector resolve with real typed columns instead
    * of the 5-default fallback. */
  private lazy val liveFieldsByProtocol: Map[String, Seq[Field]] =
    fromTshark().map(_._2.groupBy(_.protocol_filter_name)).getOrElse(Map.empty)

  /** A protocol's fields in registration order: snapshot rows when
    * vendored (stable offline behavior, golden-pinned), live `tshark -G`
    * rows otherwise. */
  def fieldsForProtocol(p: String): Seq[Field] = {
    val snap = fields.filter(_.protocol_filter_name == p)
    if (snap.nonEmpty) snap else liveFieldsByProtocol.getOrElse(p, Seq.empty)
  }

  /** Bind-time schema computation (reference `FetchSelectedFields`,
    * `:53-78`): frame defaults, then each requested protocol's glossary
    * fields in glossary order (protocols in user-listed order), then the
    * info column. Unknown protocols contribute nothing — silently, exactly
    * like the reference's empty glossary result (`:71-76`) — unless a live
    * tshark dictionary resolves them (see [[fieldsForProtocol]]). */
  def schemaFor(protocolList: Seq[String]): StructType = {
    val perProto = protocolList.flatMap(fieldsForProtocol)
    val protoFields = perProto.map(_.filter_name)
      .distinct.filterNot(f => defaultFrameFields.contains(f) || f == infoField)
    // snapshot types win on collision so goldens can never drift under a
    // host tshark with different field typing
    val typeOf = perProto.map(f => f.filter_name -> f).toMap ++ byFilterName
    val names = defaultFrameFields ++ protoFields ++ Seq(infoField)
    StructType(names.map { n =>
      val tpe = typeOf.get(n).map(f => sparkType(f.field_type)).getOrElse(StringType)
      StructField(n, tpe, nullable = true)
    })
  }

  /** Register both dictionary tables as temp views (reference A6/A7). */
  def register(spark: SparkSession): Unit = {
    import spark.implicits._
    spark.createDataset(protocols).toDF().createOrReplaceTempView("glossary_protocols")
    spark.createDataset(fields).toDF().createOrReplaceTempView("glossary_fields")
  }

  /** `initialize_glossary()` parity (reference `:264-272`, `:430-450`):
    * idempotently (re)register and return the two status rows. */
  def init(spark: SparkSession): DataFrame = {
    import spark.implicits._
    register(spark)
    Seq("glossary_protocols initialized", "glossary_fields initialized")
      .toDF("status_message")
  }

  /** `check_tshark_installed()` parity (reference `:254-261`). */
  def checkTsharkInstalled(): Boolean =
    try {
      val p = new ProcessBuilder("tshark", "-v").redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** Live regeneration path when tshark exists: parse `tshark -G fields`
    * (8 tab-separated cols, keep 'F' rows) / `-G protocols` (6 cols). */
  def fromTshark(): Option[(Seq[Protocol], Seq[Field])] =
    if (!checkTsharkInstalled()) None
    else try {
      def run(args: String*): Seq[String] = {
        val p = new ProcessBuilder(("tshark" +: args): _*).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        p.waitFor()
        out.split('\n').toSeq.filter(_.nonEmpty)
      }
      val protos = run("-G", "protocols").flatMap { l =>
        val c = l.split("\t", -1)
        if (c.length >= 6)
          Some(Protocol(c(0).trim, c(1).trim, c(2).trim, c(3) == "T", c(4) == "T", c(5) == "T"))
        else None
      }
      val flds = run("-G", "fields").flatMap { l =>
        val c = l.split("\t", -1)
        if (c.length >= 8 && c(0) == "F")
          Some(Field(c(1).trim, c(2).trim, c(3).trim, c(4).trim, c(5).trim, c(6).trim, c(7).trim))
        else None
      }
      Some((protos, flds))
    } catch { case _: Exception => None }
}
