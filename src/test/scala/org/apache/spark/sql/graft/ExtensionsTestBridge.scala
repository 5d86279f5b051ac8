package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, so the spec's check that the installer actually
  * populates a registry has to run from this package.
  */
object ExtensionsTestBridge {
  /** Names present in a fresh registry after running the installer. */
  def installedNames(installer: SparkSessionExtensions => Unit,
                     names: Seq[String]): Seq[String] = {
    val ext = new SparkSessionExtensions
    installer(ext)
    val reg = ext.registerFunctions(FunctionRegistry.builtin.clone())
    names.filter(n => reg.functionExists(FunctionIdentifier(n)))
  }
}
