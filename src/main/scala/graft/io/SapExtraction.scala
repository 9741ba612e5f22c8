package graft.io

/** SAP BW / B4 (ADSO) JDBC extraction query generation.
  *
  * Capability parity with the reference's SAP extraction utilities
  * (`lakehouse_engine/utils/extraction/sap_bw_extraction_utils.py:78-374`,
  * `sap_b4_extraction_utils.py:1-281`): the heavy lifting is pushed to the
  * SAP side as generated SQL subqueries used as the JDBC `dbtable`
  * (`(SELECT ...) t`), with init extractions reading the active table
  * joined to activation requests and delta extractions reading the
  * changelog filtered by the last extracted request timestamp/REQTSN.
  * The actual JDBC read then goes through [[JdbcExtraction]] with
  * partitionColumn/predicates parallelism.
  */
object SapExtraction {

  /** SAP BW DSO extraction config. */
  final case class BwConfig(
      odsobject: String,
      changelogTable: Option[String] = None,
      actRequestTable: String = "SAPHANADB.RSODSACTREQ",
      includeChangelogTech: Boolean = true,
      extraCols: Seq[String] = Seq.empty)

  /** Active-table name for a BW DSO ("/BIC/A<ods>00"). */
  def bwActiveTable(cfg: BwConfig): String = s"""SAPHANADB."/BIC/A${cfg.odsobject}00""""

  /** Changelog table: explicit or the DSO default ("/BIC/B<ods>" in real
    * systems is looked up; the reference falls back to <ods>40). */
  def bwChangelogTable(cfg: BwConfig): String =
    cfg.changelogTable.getOrElse(s"""SAPHANADB."/BIC/A${cfg.odsobject}40"""")

  /** Init extraction: full read of the active table, stamped with the max
    * activation-request timestamp so later deltas have a watermark
    * (reference `sap_bw_extraction_utils.py:90-173`). */
  def bwInitQuery(cfg: BwConfig): String = {
    val extra = if (cfg.extraCols.isEmpty) "" else cfg.extraCols.mkString(", ", ", ", "")
    s"""(SELECT t.*$extra,
       | CAST((SELECT COALESCE(MAX(TIMESTAMP), 0) FROM ${cfg.actRequestTable}
       |   WHERE ODSOBJECT = '${cfg.odsobject}') AS DECIMAL(15,0)) AS actrequest_timestamp,
       | '0' AS datapakid, 0 AS partno, 0 AS record
       | FROM ${bwActiveTable(cfg)} t) t""".stripMargin.replace("\n", "")
  }

  /** Delta extraction: changelog rows whose activation request is newer
    * than the last extracted timestamp. */
  def bwDeltaQuery(cfg: BwConfig, lastTimestamp: String): String =
    s"""(SELECT t.*,
       | CAST(a.TIMESTAMP AS DECIMAL(15,0)) AS actrequest_timestamp
       | FROM ${bwChangelogTable(cfg)} t
       | JOIN ${cfg.actRequestTable} a ON t.REQUEST = a.ODSID
       | WHERE a.ODSOBJECT = '${cfg.odsobject}'
       |   AND CAST(a.TIMESTAMP AS DECIMAL(15,0)) > $lastTimestamp) t"""
      .stripMargin.replace("\n", "")

  /** SAP B4 / ADSO extraction config (REQTSN-based). */
  final case class B4Config(
      adsoName: String,
      changelogTable: Option[String] = None,
      requestStatusTable: String = "SAPHANADB.RSPMREQUEST",
      requestColName: String = "REQTSN")

  def b4ActiveTable(cfg: B4Config): String = s"""SAPHANADB."/BIC/A${cfg.adsoName}2""""
  def b4ChangelogTable(cfg: B4Config): String =
    cfg.changelogTable.getOrElse(s"""SAPHANADB."/BIC/A${cfg.adsoName}3"""")

  /** Max stored REQTSN query (the watermark lookup pushed to SAP). */
  def b4MaxReqtsnQuery(cfg: B4Config): String =
    s"""(SELECT COALESCE(MAX(${cfg.requestColName}), '000000000000000000000000')
       | AS max_reqtsn FROM ${b4ChangelogTable(cfg)}) t""".stripMargin.replace("\n", "")

  def b4InitQuery(cfg: B4Config): String =
    s"""(SELECT t.*, '000000000000000000000000' AS reqtsn
       | FROM ${b4ActiveTable(cfg)} t) t""".stripMargin.replace("\n", "")

  def b4DeltaQuery(cfg: B4Config, lastReqtsn: String): String =
    s"""(SELECT t.* FROM ${b4ChangelogTable(cfg)} t
       | JOIN ${cfg.requestStatusTable} r
       |   ON t.${cfg.requestColName} = r.${cfg.requestColName}
       | WHERE r.STATUS = 'GG' AND t.${cfg.requestColName} > '$lastReqtsn') t"""
      .stripMargin.replace("\n", "")
}
