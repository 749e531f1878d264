package graft.store

/** Error hierarchy mirroring the reference's exceptions module
  * (reference: pystore/exceptions.py; tested by tests/test_exceptions.py:13-95
  * — all extend one root so callers can catch the family).
  */
class GraftError(msg: String) extends RuntimeException(msg)

class ItemNotFoundError(msg: String) extends GraftError(msg)
class ItemExistsError(msg: String) extends GraftError(msg)
class CollectionNotFoundError(msg: String) extends GraftError(msg)
class CollectionExistsError(msg: String) extends GraftError(msg)
class SnapshotNotFoundError(msg: String) extends GraftError(msg)
class DataIntegrityError(msg: String) extends GraftError(msg)
class ValidationError(msg: String, val errors: Seq[String] = Nil) extends GraftError(msg)
class SchemaValidationError(msg: String) extends GraftError(msg)
class StorageError(msg: String) extends GraftError(msg)
class TransactionError(msg: String) extends GraftError(msg)
class LockTimeoutError(msg: String) extends GraftError(msg)
/** A publish fence refusal: the item's committed generation moved
  * between a read-modify-write's read and its publish (another writer
  * — thread or process — committed in between). The mutation was NOT
  * applied; append retries it over the fresh state automatically. */
class ConcurrentWriteError(msg: String) extends GraftError(msg)
