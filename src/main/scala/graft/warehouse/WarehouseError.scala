package graft.warehouse

/** Error taxonomy — the reference's falsy-exception hierarchy
  * (`src/load_datawarehouse/exceptions.py:1-64`) translated to an
  * idiomatic sealed ADT + `Either[WarehouseError, A]`.
  *
  * The reference makes every exception object falsy (`__bool__ = False`)
  * so callers branch with `if (result)`; the Scala-native equivalent of
  * that error-as-value contract is `Either` (Left = the falsy object,
  * Right = success).
  */
sealed trait WarehouseError extends Product with Serializable {
  def message: String
}

/** WarehouseTableNotFound (exceptions.py) — tolerated by get/drop flows. */
final case class TableNotFound(table: String) extends WarehouseError {
  def message = s"table not found: $table"
}

/** WarehouseAccessDenied. */
final case class AccessDenied(message: String) extends WarehouseError

/** WarehouseInvalidInput — unsupported input object type. */
final case class InvalidInput(message: String) extends WarehouseError

/** WarehouseTableRowsInvalid — rows rejected at load. */
final case class RowsInvalid(message: String) extends WarehouseError

/** WarehouseRowOversize (exceptions.py:62-64): a single row's JSON
  * serialization exceeds the chunk size limit.
  */
final case class RowOversize(rowBytes: Long, limit: Long) extends WarehouseError {
  def message = s"single row of $rowBytes bytes exceeds chunk limit $limit"
}

/** WarehouseTableGenericError — catch-all with cause. */
final case class TableGenericError(message: String,
                                   cause: Option[Throwable] = None) extends WarehouseError
