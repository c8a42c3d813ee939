package graft

import org.scalatest.funsuite.AnyFunSuite

/** The slate-wipe invariant (round-13 verdict #6): any module-level
  * cache holding checkpointed frames MUST be registered for clearing
  * before a measurement harness may unpersist the session's RDD
  * blocks, or the wipe leaves poisoned handles (truncated lineage
  * cannot recompute).  `ExtQueries.sessionCache` makes the pairing
  * structural; this spec fails the build if a TrieMap field anywhere
  * in main source bypasses the factory.
  */
class CacheRegistrySpec extends AnyFunSuite {

  test("every TrieMap field in ExtQueries is in the cache registry") {
    val obj = graft.queries.ExtQueries
    val fields = obj.getClass.getDeclaredFields.toSeq
      .filter(f => classOf[scala.collection.concurrent.TrieMap[_, _]]
        .isAssignableFrom(f.getType))
    assert(fields.nonEmpty, "expected at least one cache field")
    val registered = new java.util.IdentityHashMap[AnyRef, Unit]()
    graft.queries.ExtQueries.cacheRegistry.forEach(m =>
      registered.put(m, ()))
    fields.foreach { f =>
      f.setAccessible(true)
      val v = f.get(obj).asInstanceOf[AnyRef]
      assert(registered.containsKey(v),
        s"cache field ${f.getName} is not registered — declare it via " +
          "sessionCache() so clearSessionSlate covers it")
    }
    assert(registered.size() == fields.size,
      s"registry holds ${registered.size()} caches but ExtQueries " +
        s"declares ${fields.size} TrieMap fields — stale registration?")
  }

  test("no TrieMap is declared outside ExtQueries in main source") {
    // grep the compiled-from sources: a cache in another module would
    // dodge both the registry and the reflection above.
    val root = new java.io.File("src/main/scala")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = walk(root).filter { f =>
      val txt = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      txt.contains("TrieMap") &&
        f.getName != "ExtQueries.scala"
    }
    assert(offenders.isEmpty,
      s"TrieMap caches outside ExtQueries (register them through a " +
        s"shared factory first): ${offenders.map(_.getPath)}")
  }

  test("clearClusterCache empties every registered cache") {
    // seed a marker entry through the registry itself, then clear
    graft.queries.ExtQueries.cacheRegistry.forEach { m =>
      m.asInstanceOf[scala.collection.concurrent.TrieMap[Any, Any]]
        .put(("spec-marker", "x"), "v")
    }
    graft.queries.ExtQueries.clearClusterCache()
    graft.queries.ExtQueries.cacheRegistry.forEach(m =>
      assert(m.isEmpty, "registered cache not emptied by the choke point"))
  }
}
