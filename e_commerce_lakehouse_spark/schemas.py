"""Explicit schemas for every table the engine touches.

Two families:
  1. The driver's TPC-H-ish testdata star schema (/root/testdata/sf*/).
  2. The reference e-commerce star schema + the 4 Kafka event-stream
     schemas (reference: scripts/database/load_tables.py:23-75 and
     scripts/spark_jobs/streaming_flow.py:42-65).

Money is modeled as DOUBLE to match the driver testdata; DecimalType
variants are provided for deployments that need exact NUMERIC(10,2)
semantics at the JDBC boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Driver testdata (TPC-H-ish). Names/types verified against the parquet
# footers at /root/testdata/sf0.001.
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON string payload
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference e-commerce star schema (load_tables.py:23-75). DOUBLE for money;
# *_DECIMAL variants mirror the Postgres NUMERIC(10,2) boundary exactly.
# ---------------------------------------------------------------------------

MONEY = DoubleType()
MONEY_DECIMAL = DecimalType(10, 2)

CATEGORIES = StructType(
    [
        StructField("category_id", IntegerType()),
        StructField("category_name", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)

PRODUCTS = StructType(
    [
        StructField("product_id", IntegerType()),
        StructField("product_name", StringType()),
        StructField("category_id", IntegerType()),
        StructField("brand", StringType()),
        StructField("price", MONEY),
        StructField("updated_at", TimestampType()),
    ]
)

USERS = StructType(
    [
        StructField("user_id", IntegerType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("email", StringType()),
        StructField("phone_number", StringType()),
        StructField("address", StringType()),
        StructField("city", StringType()),
        StructField("country", StringType()),
        StructField("created_at", TimestampType()),
    ]
)

ECOM_ORDERS = StructType(
    [
        StructField("order_id", IntegerType()),
        StructField("user_id", IntegerType()),
        StructField("total_price", MONEY),
        StructField("order_date", TimestampType()),
    ]
)

ORDER_ITEMS = StructType(
    [
        StructField("order_item_id", IntegerType()),
        StructField("order_id", IntegerType()),
        StructField("product_id", IntegerType()),
        StructField("quantity", IntegerType()),
        StructField("price", MONEY),
        StructField("item_total", MONEY),
    ]
)

REVIEWS = StructType(
    [
        StructField("review_id", IntegerType()),
        StructField("user_id", IntegerType()),
        StructField("product_id", IntegerType()),
        StructField("rating", IntegerType()),
        StructField("review_text", StringType()),
        StructField("review_date", TimestampType()),
    ]
)

ECOM_TABLES: dict[str, StructType] = {
    "categories": CATEGORIES,
    "products": PRODUCTS,
    "users": USERS,
    "orders": ECOM_ORDERS,
    "order_items": ORDER_ITEMS,
    "reviews": REVIEWS,
}

# ---------------------------------------------------------------------------
# Event-stream schemas (streaming_flow.py:42-65). user_id stays STRING on
# the stream side (anonymous users exist); cast at join time.
# ---------------------------------------------------------------------------

_STREAM_COMMON = [
    StructField("event_id", StringType()),
    StructField("timestamp", StringType()),  # "%Y-%m-%d %H:%M:%S" — parse with to_timestamp
    StructField("user_id", StringType()),
]

PAGE_VIEW_EVENT = StructType([*_STREAM_COMMON, StructField("product_id", StringType())])

ADD_TO_CART_EVENT = StructType(
    [
        *_STREAM_COMMON,
        StructField("product_id", StringType()),
        StructField("quantity", IntegerType()),
    ]
)

PURCHASE_EVENT = StructType(
    [
        *_STREAM_COMMON,
        StructField("product_id", StringType()),
        StructField("quantity", IntegerType()),
        StructField("price", DoubleType()),
    ]
)

REVIEW_EVENT = StructType(
    [
        *_STREAM_COMMON,
        StructField("product_id", StringType()),
        StructField("rating", IntegerType()),
        StructField("review_text", StringType()),
    ]
)

STREAM_EVENT_SCHEMAS: dict[str, StructType] = {
    "page_view": PAGE_VIEW_EVENT,
    "add_to_cart": ADD_TO_CART_EVENT,
    "purchase": PURCHASE_EVENT,
    "review": REVIEW_EVENT,
}

# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload + typed metadata (engine extension).
# ---------------------------------------------------------------------------

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
