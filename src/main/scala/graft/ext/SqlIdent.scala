package graft.ext

/** Backtick-quoting for caller-supplied table names interpolated into
  * raw SQL (`ALTER TABLE …`, `SHOW TBLPROPERTIES …`).  Each
  * dot-separated part is wrapped in backticks with embedded backticks
  * doubled — Spark's quoted-identifier rule — so a name with spaces,
  * dashes, or quote characters round-trips instead of failing to parse
  * or splicing into the statement.  DataFrame-API paths
  * (`saveAsTable`, `spark.table`) parse identifiers themselves and
  * don't need this. */
private[ext] object SqlIdent {
  def quote(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
}
