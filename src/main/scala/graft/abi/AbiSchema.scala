package graft.abi

import org.apache.spark.sql.types._
import scala.collection.mutable

/** ABI → relational schema derivation.
  *
  * Reproduces the reference's table universe (SURVEY.md §1.1/§2.2):
  *  - functions with `stateMutability != "view"` → `<contract>_call_<fn>`;
  *    events with `anonymous != true` → `<contract>_evt_<event>`
  *    (filter at classes.py:39/60, functions.py:88/104, eth-contract.py:100/121)
  *  - lower-cased names; overloads disambiguated by a per-name counter that
  *    starts at the *second* occurrence: bare, then 0, 1, …
  *    (functions.py:96-114, increment-after-use)
  *  - unnamed ABI inputs become v0, v1, … by position (classes.py:67-72)
  *  - 6 common columns on every table (classes.py:95,136)
  *
  * Type mapping is the Spark-native column (SURVEY.md §1.2): binary for
  * address/bytes*, Decimal(38,0) for 64..256-bit ints (Maker wad/ray values
  * fit; rad-scale consumers use the wad/ray/rad rescaling expressions
  * before arithmetic), narrow integrals for small ints. The reference's PG
  * `string→bytea` and `uint256[]→numeric` quirks (classes.py:137) are
  * deliberately NOT reproduced.
  */
object AbiSchema {

  val commonFields: Seq[StructField] = Seq(
    StructField("block_number", LongType),
    StructField("block_hash", BinaryType),
    StructField("address", BinaryType),
    StructField("log_index", IntegerType),
    StructField("transaction_index", IntegerType),
    StructField("transaction_hash", BinaryType))

  private val IntPat = raw"(u?)int(\d*)".r
  private val FixedArrayPat = raw"(.+)\[(\d+)\]".r

  /** Spark type for one ABI type string. */
  def sparkType(abiType: String): DataType = abiType match {
    case t if t.endsWith("[]") => ArrayType(sparkType(t.dropRight(2)))
    case FixedArrayPat(elem, _) => ArrayType(sparkType(elem))
    case "address" => BinaryType
    case "bool" => BooleanType
    case "string" => StringType
    case t if t.startsWith("bytes") => BinaryType // bytes, bytes1..bytes32
    case IntPat(_, bitsStr) =>
      val bits = if (bitsStr.isEmpty) 256 else bitsStr.toInt
      if (bits <= 8) ShortType
      else if (bits <= 16) IntegerType
      else if (bits <= 56) LongType
      else DecimalType(38, 0)
    case t if t.startsWith("tuple") =>
      throw new IllegalArgumentException(
        s"tuple types need component info — use sparkType(p: Param): $t")
    case other => throw new IllegalArgumentException(s"unsupported ABI type: $other")
  }

  /** Reference-typed params (arrays, tuples, bytes, string) are stored
    * as their keccak hash when indexed — the topic is undecodable by
    * design (standard Ethereum event semantics). */
  def hashedWhenIndexed(p: AbiJson.Param): Boolean =
    p.abiType.startsWith("tuple") || p.abiType.endsWith("]") ||
      p.abiType == "bytes" || p.abiType == "string"

  /** Param-aware Spark type: tuples map to StructType of their components
    * (recursively), tuple arrays to ArrayType-wrapped structs; indexed
    * reference types surface as the 32-byte topic hash. */
  def sparkType(p: AbiJson.Param, wideIntsAsBinary: Boolean): DataType =
    if (p.indexed && hashedWhenIndexed(p)) BinaryType
    else if (p.abiType.startsWith("tuple")) {
      val struct: DataType = StructType(p.components.zipWithIndex.map {
        case (c, i) => StructField(columnName(c, i), sparkType(c, wideIntsAsBinary))
      })
      val arrayDepth = p.abiType.count(_ == '[')
      (1 to arrayDepth).foldLeft(struct)((t, _) => ArrayType(t))
    } else sparkType(p.abiType, wideIntsAsBinary)

  def sparkType(p: AbiJson.Param): DataType = sparkType(p, wideIntsAsBinary = false)

  /** Column name for input `i` at position `pos` (v0,v1,… when unnamed). */
  def columnName(p: AbiJson.Param, pos: Int): String =
    if (p.name == null || p.name.isEmpty) s"v$pos" else p.name.toLowerCase

  /** One produced table: name, source ABI entry, full Spark schema.
    * `wideIntsAsBinary` records the rad-safe mapping the schema was
    * built with, so decode expressions constructed from the def emit
    * the matching representation (32-byte words, not Decimal(38,0)).
    *
    * `schemaName` is the warehouse NAMESPACE the table belongs to — the
    * reference's `create schema if not exists {schema}` (classes.py:56,
    * README.md:73), derived from the config tree's directory name
    * (conf/<schema>/<contract>.abi). It is part of the table's identity:
    * aave and aave_v2 both define `lending_pool_evt_deposit` (12 of the
    * 18 shared names with DIFFERENT ABI shapes), and an unqualified
    * namespace silently merges them into one table. Empty for
    * single-namespace callers (fixtures, unit tests), where
    * [[qualified]] degrades to the bare name. */
  final case class TableDef(table: String, entry: AbiJson.Entry, schema: StructType,
                            isEvent: Boolean,
                            wideIntsAsBinary: Boolean = false,
                            schemaName: String = "") {
    /** Dispatch key: topic0 (events) or 4-byte selector (functions). */
    lazy val dispatchKey: Seq[Byte] = {
      val h = Keccak.hash256(entry.signature)
      if (isEvent) h.toSeq else h.take(4).toSeq
    }

    /** Fully-qualified name — `<schema>.<table>` when a namespace is
      * known, the bare table name otherwise. This is the demux routing
      * tag and the warehouse table identity. */
    def qualified: String =
      if (schemaName.isEmpty) table else s"$schemaName.$table"
  }

  /** Whether an ABI entry produces a table (the reference's filter). */
  def producesTable(e: AbiJson.Entry): Boolean =
    (e.entryType == "function" && e.stateMutability != "view" &&
      e.stateMutability != "pure") ||
      (e.entryType == "event" && !e.anonymous)

  /** 64..256-bit int? (the types that need Decimal(38) or binary). */
  private[graft] def isWideInt(abiType: String): Boolean = abiType match {
    case IntPat(_, bitsStr) =>
      (if (bitsStr.isEmpty) 256 else bitsStr.toInt) > 56
    case _ => false
  }

  /** Spark type with the rad-safe option: wide ints as 32-byte binary
    * instead of Decimal(38,0) — rad-scale uint256 values can need 78
    * digits (SURVEY §1.2); the wad/ray/rad rescalers accept both.
    * Array suffixes recurse, so uint256[3] and uint256[][] carry the
    * binary element type too — the decoder's tuple walk is recursive in
    * `wide`, and a schema that stopped at one dynamic-array level would
    * declare Decimal elements over byte-array values (silent row
    * corruption at read time). */
  def sparkType(abiType: String, wideIntsAsBinary: Boolean): DataType =
    if (!wideIntsAsBinary) sparkType(abiType)
    else if (isWideInt(abiType)) BinaryType
    else abiType match {
      case t if t.endsWith("[]") =>
        ArrayType(sparkType(t.dropRight(2), wideIntsAsBinary))
      case FixedArrayPat(elem, _) =>
        ArrayType(sparkType(elem, wideIntsAsBinary))
      case _ => sparkType(abiType)
    }

  /** Derive every table for one contract ABI, with overload suffixing.
    * `schemaName` qualifies the defs into their warehouse namespace
    * (conf/<schema>/ directory) — callers loading a multi-schema config
    * tree MUST pass it, or same-named tables from different schemas
    * (aave vs aave_v2 lending_pool) merge silently. */
  def tables(contract: String, abi: Seq[AbiJson.Entry],
             wideIntsAsBinary: Boolean = false,
             schemaName: String = ""): Seq[TableDef] = {
    val seen = mutable.Map.empty[String, Int] // lowercased name → occurrences so far
    abi.filter(producesTable).map { e =>
      val kind = if (e.entryType == "event") "evt" else "call"
      val base = s"${contract.toLowerCase}_${kind}_${e.name.toLowerCase}"
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      // reference rule: first occurrence bare, then suffix 0, 1, …
      val table = if (n == 0) base else s"$base${n - 1}"
      val cols = e.inputs.zipWithIndex.map { case (p, i) =>
        StructField(columnName(p, i), sparkType(p, wideIntsAsBinary))
      }
      TableDef(table, e, StructType(commonFields ++ cols), kind == "evt",
        wideIntsAsBinary, schemaName)
    }
  }

  /** Dispatch index for a contract: key bytes → TableDef.
    * Event keys are 32-byte topic0; function keys are 4-byte selectors.
    * Broadcast this map to executors for the decode pass (S7). */
  def dispatchIndex(defs: Seq[TableDef]): Map[Seq[Byte], TableDef] =
    defs.map(d => d.dispatchKey -> d).toMap
}
