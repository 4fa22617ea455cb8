package graft.queries

/** Per-(query, process) scratch location for queries that MUTATE an index
  * or table on disk (versioned-table DDL, streaming-ingest folds): wiped
  * at the start of every invocation — a bench best-of-N within one
  * process reuses one slot instead of accumulating N copies — and
  * registered ONCE per distinct path for recursive deletion at JVM exit
  * (hooks are never deduplicated by the JVM, so per-invocation
  * registration would accumulate threads). Safe to wipe at entry: by the
  * time a query is re-invoked, the previous invocation's DataFrame has
  * been fully consumed.
  */
private[queries] object QueryScratch {

  private val hookedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  def dir(name: String): String = {
    val p = java.nio.file.Paths.get(
      "target", "graft_scratch", s"$name-${ProcessHandle.current().pid()}")
    graft.operators.Indexes.deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
    if (hookedPaths.add(p))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => graft.operators.Indexes.deleteRecursively(p)))
    p.toString
  }
}
