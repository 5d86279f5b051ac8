package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation family: union / unionByName / intersect / except and the
  * multiset (`ALL`) variants. All operands are narrow projections so the
  * whole family is cheap even at scale (set ops shuffle on the full row).
  */
object SetOps {

  private def highBalCustomers(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))

  private def bigSpenders(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("k"))

  /** EXCEPT's subtrahend uses a premium threshold ([[PremiumPrice]]):
    * every customer places a >150k order at the driver scale factors, so
    * highBal EXCEPT bigSpenders is EMPTY there — a zero-row hash match is
    * a degenerate oracle (any bug that empties the output still passes).
    * 300k keeps the subtraction non-trivial at every test SF (1 / 14 /
    * 134 survivors at sf0.001 / 0.01 / 0.1). */
  private def premiumSpenders(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").filter(col("o_totalprice") > PremiumPrice)
      .select(col("o_custkey").as("k"))

  private[queries] val PremiumPrice = 300000

  val defs: Map[String, Q] = Map(
    "q_set_union_all" -> ((s, dir) =>
      highBalCustomers(s, dir).union(bigSpenders(s, dir)).orderBy("k")),
    "q_set_union_distinct" -> ((s, dir) =>
      highBalCustomers(s, dir).union(bigSpenders(s, dir)).distinct().orderBy("k")),
    "q_set_union_by_name" -> ((s, dir) => {
      // unionByName aligns on column names, not position.
      val a = tbl(s, dir, "customer").select(col("c_custkey").as("k"), col("c_name").as("name"))
      val b = tbl(s, dir, "supplier").select(col("s_name").as("name"), col("s_suppkey").as("k"))
      a.unionByName(b).orderBy("k", "name")
    }),
    "q_set_intersect" -> ((s, dir) =>
      highBalCustomers(s, dir).intersect(bigSpenders(s, dir)).orderBy("k")),
    "q_set_except" -> ((s, dir) =>
      highBalCustomers(s, dir).except(premiumSpenders(s, dir)).orderBy("k")),
    "q_set_intersect_all" -> ((s, dir) =>
      highBalCustomers(s, dir).intersectAll(bigSpenders(s, dir)).orderBy("k")),
    "q_set_except_all" -> ((s, dir) =>
      bigSpenders(s, dir).exceptAll(highBalCustomers(s, dir)).orderBy("k"))
  )

  private val a = "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000"
  private val b = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000"
  private val p =
    s"SELECT o_custkey AS k FROM orders WHERE o_totalprice > $PremiumPrice"

  val oracles: Map[String, String] = Map(
    "q_set_union_all" -> s"SELECT k FROM ($a UNION ALL $b) ORDER BY k",
    "q_set_union_distinct" -> s"SELECT k FROM ($a UNION $b) ORDER BY k",
    "q_set_union_by_name" ->
      """SELECT k, name FROM (
           SELECT c_custkey AS k, c_name AS name FROM customer
           UNION ALL
           SELECT s_suppkey AS k, s_name AS name FROM supplier)
         ORDER BY k, name""",
    "q_set_intersect" -> s"SELECT k FROM ($a INTERSECT $b) ORDER BY k",
    "q_set_except" -> s"SELECT k FROM ($a EXCEPT $p) ORDER BY k",
    "q_set_intersect_all" -> s"SELECT k FROM ($a INTERSECT ALL $b) ORDER BY k",
    "q_set_except_all" -> s"SELECT k FROM ($b EXCEPT ALL $a) ORDER BY k"
  )
}
