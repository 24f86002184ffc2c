package graft

import graft.state.Engine
import org.apache.spark.sql.SparkSession

/** SQL surface over the engine: register the entity tables as temp
  * views (+ the native functions), so the whole store is queryable with
  * plain Spark SQL — a capability the reference (REST/JSON only) never
  * had, and which Spark gives for free (SURVEY §2.2 "SQL").
  */
object EngineSql {
  def registerViews(spark: SparkSession, engine: Engine,
                    prefix: String = ""): Unit = {
    graft.expressions.CosineSimilarity.register(spark)
    engine.librariesDF(spark).createOrReplaceTempView(s"${prefix}libraries")
    engine.documentsDF(spark).createOrReplaceTempView(s"${prefix}documents")
    engine.chunksDF(spark).createOrReplaceTempView(s"${prefix}chunks")
  }
}
