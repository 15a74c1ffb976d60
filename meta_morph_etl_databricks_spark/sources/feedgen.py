"""Synthetic daily-feed generator — the reference's feed service
(Rest-API/main.py:93-217) re-expressed as distributed column expressions.

The reference builds each dataset in a driver-side Python loop (list
comprehensions over ``random``/``faker``) and uploads CSVs to a bucket;
that caps the feed at driver memory.  Here every table is
``spark.range(n)`` + deterministic hash-derived columns — generation is
embarrassingly parallel, codegen'd end-to-end, and a 10-billion-row
sales feed costs no more driver memory than a 10-row one.

Semantics kept from the reference:
- schemas + human headers (``Supplier Id``, ...) per feed
  (main.py:106-112, 130-142, 151-158, 203-214);
- sales concentrate on an "active" subset of products/customers
  (main.py:172-181 samples k ids before choosing);
- order status conditions on recency: <= 50 days old -> Pending/Shipped
  70/30, older -> Delivered/Cancelled 90/10 (main.py:191-202);
- numeric ranges: quantity 1-20, discount 0-17, shipping 5-50, selling
  price 10-700, cost at 45-80% of selling (main.py:131-137,186-189).

Randomness is ``xxhash64(id, tag)`` folded to U[0,1) — deterministic in
(seed, row id), independent of partitioning and retries (unlike
``F.rand``, which re-draws if a map task is replayed on reordered
input — see operators/skew.py for the same hazard).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAYMENT_MODES = ["Credit Card", "Debit Card", "UPI", "Cash on Delivery"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
CITIES = ["Hyderabad", "Chennai", "Mumbai", "Delhi", "Bengaluru", "Pune", "Kolkata"]
CATEGORIES = ["Electronics", "Apparel", "Grocery", "Furniture", "Toys", "Sports"]


def _u(tag: str, seed: int, col: Column | None = None) -> Column:
    """U[0,1) from xxhash64(row id, tag, seed): one hash, codegen'd."""
    base = F.xxhash64(col if col is not None else F.col("id"), F.lit(tag), F.lit(seed))
    return F.pmod(base, F.lit(1_000_000_000)).cast("double") / 1_000_000_000.0


def _uniform(tag: str, seed: int, lo: float, hi: float) -> Column:
    return F.round(_u(tag, seed) * (hi - lo) + lo, 2)


def _uniform_int(tag: str, seed: int, lo: int, hi: int) -> Column:
    return (_u(tag, seed) * (hi - lo + 1) + lo).cast("int")


def _choice(tag: str, seed: int, options: list[str]) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, _uniform_int(tag, seed, 1, len(options)))


def gen_suppliers(spark: SparkSession, n: int = 252, seed: int = 0) -> DataFrame:
    df = spark.range(n)
    return df.select(
        F.format_string("SUP%04d", F.col("id") + 1).alias("Supplier Id"),
        F.format_string("Supplier %d", F.col("id") + 1).alias("Supplier Name"),
        F.format_string("contact%d@supplier.example", F.col("id") + 1).alias("Contact Details"),
        _choice("region", seed, REGIONS).alias("Region"),
    )


def gen_products(
    spark: SparkSession, n: int = 450, num_suppliers: int = 252, active_suppliers: int = 215, seed: int = 0
) -> DataFrame:
    """``active_suppliers`` mirrors main.py:124-127 — products draw their
    supplier from a k-subset, so some suppliers carry no products."""
    k = min(active_suppliers, num_suppliers)
    selling = _uniform("sell", seed, 10, 700)
    return spark.range(n).select(
        F.format_string("P%05d", F.col("id") + 1).alias("Product Id"),
        F.format_string("Product %d", F.col("id") + 1).alias("Product Name"),
        _choice("cat", seed, CATEGORIES).alias("Category"),
        selling.alias("Selling Price"),
        F.round(selling * (_u("costf", seed) * 0.35 + 0.45), 2).alias("Cost Price"),
        _uniform_int("stock", seed, 6000, 12000).alias("Stock Quantity"),
        _uniform_int("reorder", seed, 10, 50).alias("Reorder Level"),
        F.format_string("SUP%04d", _uniform_int("sup", seed, 1, k)).alias("Supplier Id"),
    )


def gen_customers(spark: SparkSession, n: int = 8000, seed: int = 0) -> DataFrame:
    return spark.range(n).select(
        F.format_string("C%06d", F.col("id") + 1).alias("Customer Id"),
        F.format_string("Customer %d", F.col("id") + 1).alias("Name"),
        _choice("city", seed, CITIES).alias("City"),
        F.format_string("customer%d@mail.example", F.col("id") + 1).alias("Email"),
        F.format_string("+91-9%09d", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(10**9))).alias(
            "Phone Number"
        ),
    )


def gen_sales(
    spark: SparkSession,
    n: int = 80_000,
    num_products: int = 450,
    num_customers: int = 8000,
    active_products: int = 350,
    active_customers: int = 6900,
    as_of: _dt.date | None = None,
    seed: int = 0,
) -> DataFrame:
    """Sales over the trailing 2 years, statuses conditioned on recency
    (main.py:184-214).  ``active_*`` reproduce the reference's sampled
    id pools: demand concentrates on a subset, giving the marts'
    anti-join/top-k queries non-degenerate inputs."""
    as_of = as_of or _dt.date.today()
    kp = min(active_products, num_products)
    kc = min(active_customers, num_customers)
    days_ago = (_u("date", seed) * 730).cast("int")
    recent = days_ago <= 50
    status = F.when(
        recent, F.when(_u("st1", seed) < 0.70, F.lit("Pending")).otherwise(F.lit("Shipped"))
    ).otherwise(
        F.when(_u("st2", seed) < 0.90, F.lit("Delivered")).otherwise(F.lit("Cancelled"))
    )
    return spark.range(n).select(
        (F.col("id") + 1).alias("Sale Id"),
        F.format_string("C%06d", _uniform_int("cust", seed, 1, kc)).alias("Customer Id"),
        F.format_string("P%05d", _uniform_int("prod", seed, 1, kp)).alias("Product Id"),
        F.date_format(F.date_sub(F.lit(as_of), days_ago), "yyyy-MM-dd").alias("Sale Date"),
        _uniform_int("qty", seed, 1, 20).alias("Quantity"),
        _uniform("disc", seed, 0, 17).alias("Discount"),
        _uniform("ship", seed, 5, 50).alias("Shipping Cost"),
        status.alias("Order Status"),
        _choice("pay", seed, PAYMENT_MODES).alias("Payment Mode"),
    )


def write_daily_feed(
    spark: SparkSession,
    out_dir: str,
    as_of: _dt.date | None = None,
    seed: int = 0,
    sizes: dict[str, int] | None = None,
) -> dict[str, str]:
    """Land all four feeds as dated header-CSVs: ``{out}/{date}/{kind}``
    (reference names ``{today}/{type}_{today}.csv``, main.py:78-90 — a
    directory of parts is the distributed equivalent).  Returns
    kind -> path for the landing-file lister (sinks.list_landing_files).
    """
    as_of = as_of or _dt.date.today()
    sz = sizes or {}
    n_sup = sz.get("supplier", 252)
    n_prod = sz.get("product", 450)
    n_cust = sz.get("customer", 8000)
    feeds = {
        "supplier": gen_suppliers(spark, n_sup, seed),
        "product": gen_products(spark, n_prod, num_suppliers=n_sup, seed=seed),
        "customer": gen_customers(spark, n_cust, seed),
        "sales": gen_sales(
            spark, sz.get("sales", 80_000), num_products=n_prod, num_customers=n_cust,
            as_of=as_of, seed=seed,
        ),
    }
    out = {}
    for kind, df in feeds.items():
        path = f"{out_dir}/{as_of.isoformat()}/{kind}"
        df.write.mode("overwrite").option("header", True).csv(path)
        out[kind] = path
    return out
