"""Medallion pipeline: the reference's silver/gold derived tables as
pure DataFrame compositions (reference silver_clean_transform.py /
gold_transfrom.py), plus a local pipeline runner.

Deliberate divergences from the reference (SURVEY §7.4):
  - full_name uses concat_ws (the reference's `+` yields NULL — F4);
  - dedup is deterministic (latest by updated_at, id tiebreak) instead
    of arbitrary dropDuplicates;
  - gold write is partitioned by (year, month) like the reference's
    Iceberg tables; storage is plain parquet + catalog views locally.

Scale notes: dims broadcast into facts; gold groupBy is partial-agg'd;
silver is a full recompute per run exactly like the reference
(createOrReplace) — incremental bronze is operators/incremental.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.cleaning import dedup_latest, full_name, normalize_text
from ..sources.csv import read_csv

# ---------------------------------------------------------------------------
# Silver transforms (silver_clean_transform.py:63-125)
# ---------------------------------------------------------------------------


def dim_products(products: DataFrame, categories: DataFrame) -> DataFrame:
    """products ⟕ categories, valid ids only, deterministic dedup
    (reference :70-79)."""
    return dedup_latest(
        products.select(
            "product_id", "product_name", "category_id", "brand", "price", "updated_at"
        )
        .join(
            F.broadcast(categories.select("category_id", "category_name")),
            "category_id",
            "left",
        )
        .filter(F.col("product_id").isNotNull()),
        keys=["product_id"],
        order_cols=[F.col("updated_at").desc()],
    )


def dim_users(users: DataFrame) -> DataFrame:
    """Email normalization + full_name (bug-fixed) + dedup (reference :85-95)."""
    return dedup_latest(
        users.select(
            "user_id",
            "first_name",
            "last_name",
            normalize_text("email").alias("email"),
            full_name("first_name", "last_name").alias("full_name"),
            "city",
            "country",
            "created_at",
        ).filter(F.col("user_id").isNotNull()),
        keys=["user_id"],
        order_cols=[F.col("created_at").desc()],
    )


def fact_purchase_event(orders: DataFrame, order_items: DataFrame) -> DataFrame:
    """orders ⋈ order_items with positivity guards (reference :102-110)."""
    return (
        orders.select(
            "order_id",
            "user_id",
            F.col("order_date").alias("event_time"),
        )
        .join(
            order_items.select("order_id", "product_id", "quantity", "price"),
            "order_id",
            "inner",
        )
        .filter((F.col("quantity") > 0) & (F.col("price") > 0))
    )


def fact_reviews(reviews: DataFrame) -> DataFrame:
    """Validated ratings + non-null keys (reference :116-124)."""
    return reviews.select(
        "review_id",
        "user_id",
        "product_id",
        "rating",
        "review_text",
        F.col("review_date").alias("event_time"),
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("product_id").isNotNull()
        & F.col("rating").between(1, 5)
    )


# ---------------------------------------------------------------------------
# Gold transforms (gold_transfrom.py:53-94)
# ---------------------------------------------------------------------------


def sales_summary(fact_purchase: DataFrame, dim_products_df: DataFrame) -> DataFrame:
    """Per year/month/product: total_quantity, total_sales (exact
    cents), num_purchases (reference :59-75)."""
    from ..functions.money import cents

    enriched = fact_purchase.join(
        F.broadcast(
            dim_products_df.select(
                "product_id", "product_name", "category_id", "category_name"
            )
        ),
        "product_id",
        "left",
    ).select(
        F.year("event_time").alias("year"),
        F.month("event_time").alias("month"),
        "product_id",
        "product_name",
        "category_id",
        "category_name",
        "quantity",
        (F.col("quantity") * cents("price")).alias("line_cents"),
    )
    return (
        enriched.groupBy(
            "year", "month", "product_id", "product_name", "category_id", "category_name"
        )
        .agg(
            F.sum("quantity").alias("total_quantity"),
            F.sum("line_cents").alias("cents"),
            F.count(F.lit(1)).alias("num_purchases"),
        )
        .select(
            "year",
            "month",
            "product_id",
            "product_name",
            "category_id",
            "category_name",
            "total_quantity",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("total_sales"),
            "num_purchases",
        )
    )


def review_summary(fact_reviews_df: DataFrame, dim_products_df: DataFrame) -> DataFrame:
    """Per year/month/product: num_reviews, avg_rating (reference :79-94)."""
    enriched = fact_reviews_df.join(
        F.broadcast(dim_products_df.select("product_id", "product_name", "category_name")),
        "product_id",
        "left",
    ).select(
        F.year("event_time").alias("year"),
        F.month("event_time").alias("month"),
        "product_id",
        "product_name",
        "category_name",
        "rating",
    )
    return (
        enriched.groupBy("year", "month", "product_id", "product_name", "category_name")
        .agg(
            F.count(F.lit(1)).alias("num_reviews"),
            F.sum("rating").alias("rating_sum"),
        )
        .select(
            "year",
            "month",
            "product_id",
            "product_name",
            "category_name",
            "num_reviews",
            (F.col("rating_sum").cast("double") / F.col("num_reviews")).alias("avg_rating"),
        )
    )


# ---------------------------------------------------------------------------
# Pipeline runner (spark_batch_job.py DAG chain, local storage)
# ---------------------------------------------------------------------------


def run_batch_pipeline(spark: SparkSession, csv_dir: str, warehouse: str) -> dict[str, int]:
    """bronze (CSV→parquet) → silver → gold on local storage; returns
    row counts per stage table. Mirrors the reference DAG
    bronze_batch_load >> silver_transform >> gold_transform
    (airflow/dags/spark_batch_job.py:73)."""
    counts: dict[str, int] = {}

    # bronze: schema-first CSV ingest → parquet (JDBC in production; the
    # source adapter is the only difference)
    bronze = {}
    for name, schema in schemas.ECOM_TABLES.items():
        df = read_csv(spark, os.path.join(csv_dir, f"{name}.csv"), schema)
        path = os.path.join(warehouse, "bronze", name)
        df.write.mode("overwrite").parquet(path)
        bronze[name] = spark.read.parquet(path)
        counts[f"bronze.{name}"] = bronze[name].count()

    # silver: cleaned dims/facts (full recompute, createOrReplace analog)
    silver = {
        "dim_products": dim_products(bronze["products"], bronze["categories"]),
        "dim_users": dim_users(bronze["users"]),
        "fact_purchase_event": fact_purchase_event(bronze["orders"], bronze["order_items"]),
        "fact_reviews": fact_reviews(bronze["reviews"]),
    }
    for name, df in silver.items():
        path = os.path.join(warehouse, "silver", name)
        df.write.mode("overwrite").parquet(path)
        silver[name] = spark.read.parquet(path)
        counts[f"silver.{name}"] = silver[name].count()

    # gold: aggregates partitioned by (year, month) like the reference
    gold = {
        "sales_summary": sales_summary(silver["fact_purchase_event"], silver["dim_products"]),
        "review_summary": review_summary(silver["fact_reviews"], silver["dim_products"]),
    }
    for name, df in gold.items():
        path = os.path.join(warehouse, "gold", name)
        df.write.mode("overwrite").partitionBy("year", "month").parquet(path)
        counts[f"gold.{name}"] = spark.read.parquet(path).count()

    return counts
