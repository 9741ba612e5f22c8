package graft.exec

import org.apache.spark.storage.StorageLevel

/** Storage-level names as ACONs spell them. The reference is a PySpark
  * engine, and PySpark levels carry `_DESER` variants
  * (MEMORY_AND_DISK_DESER et al.) that the JVM's StorageLevel.fromString
  * does not know — deserialized is the JVM default, so the `_DESER`
  * suffix maps onto the base level. */
object StorageLevels {
  def parse(name: String): StorageLevel =
    StorageLevel.fromString(name.toUpperCase.stripSuffix("_DESER"))
}
