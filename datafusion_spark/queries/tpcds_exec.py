"""Executed TPC-DS star-join subset on deterministically derived tables.

The reference only PLANS TPC-DS (see tpcds_planning.py); this module goes
one step further and EXECUTES the classic star-join reporting family
(q3 / q42 / q52 / q55 — date_dim ⋈ store_sales ⋈ item, grouped brand /
category rollups) with value-checked results, using the same technique as
the official-schema TPC-H track (tpch_official.py): every TPC-DS column
is a DETERMINISTIC function of the synthetic TPC-H testdata, spelled
identically in Spark and in the DuckDB oracle, so both engines derive
bit-identical inputs at any scale factor.

Derivations (pure key functions / calendar math — no randomness):
  date_dim     d_date_sk = days-since-1992-01-01 + 2450000 over the
               calendar 1995-01-01..2001-12-31; d_year/d_moy/d_dom.
  item         i_item_sk = p_partkey, i_brand = p_brand,
               i_brand_id = int suffix of p_brand, i_category = p_type,
               i_category_id = p_size % 10 + 1,
               i_manufact_id = p_partkey % 500,
               i_manager_id = p_partkey % 40 + 1.
  store_sales  one row per lineitem: ss_sold_date_sk from o_orderdate,
               ss_item_sk = l_partkey,
               ss_ext_sales_price = l_extendedprice.
  web_sales / catalog_sales   disjoint deterministic channel subsets of
               the same fact (l_suppkey % 4 = 1 / = 2) with ws_*/cs_*
               columns, so the three-channel query family (q12/q20/q98)
               sees distinct channels as TPC-DS intends.
  item (q98 family extras)    i_item_id = zero-padded key, i_item_desc =
               p_name, i_class = key mod 7, i_current_price =
               p_retailprice.

Query-text adaptations (each inline, same policy as tpch.py):
  * sum(ss_ext_sales_price) wrapped CAST(.. AS DOUBLE) + aliased on both
    sides (house determinism rule for decimal aggregates, SURVEY §4).
  * q55: d_year 2001 → 2000 (the synthetic order calendar ends 2001-08;
    December 2001 does not exist in the data).  Join graph, grouping,
    ordering and LIMIT are verbatim.
  * q3 keeps i_manufact_id = 436, q42/q52 keep i_manager_id = 1, q55
    keeps i_manager_id = 36 — all nonempty under the derivations above.

Scale: the fact derivation is a single lineitem⋈orders equi-join on
l_orderkey (co-partitioned); date_dim and item are dimension-sized and
broadcast into the star join exactly as a real TPC-DS plan would.
"""

from __future__ import annotations

import itertools
import os
import re
import tempfile

from datafusion_spark.catalog import load_table, register_views
from datafusion_spark.queries.registry import query

# process-local scratch for per-invocation CTE materializations (see
# _register_shared_cte): fresh directory per call, nothing reused across
# invocations, cleaned with the sandbox /tmp
_MAT_TMP = tempfile.mkdtemp(prefix="dfspark_tpcds_mat_")
_MAT_SEQ = itertools.count()

# The derive prelude defines a CTE named `customer` (the TPC-DS customer,
# derived FROM the TPC-H base table).  A later CTE (customer_address) also
# reads the BASE table — a bare `customer` there would capture the preceding
# CTE, not the view, so base-customer reads go through this alias view.
_BASE_ALIAS_STATE: dict[str, str] = {}  # applicationId -> sf_dir registered


def _ensure_views(spark, sf_dir: str) -> None:
    """Session temp views for the derive prelude (r12): a view lookup reuses
    the relation resolved at registration, where an inline parquet.`path`
    ref pays ~0.15 s of driver-side listing + footer schema inference on
    EVERY spark.sql() analysis (measured: q14 full run 4.05 -> 3.04 s).
    Execution still scans the parquet inputs — this caches metadata only."""
    register_views(spark, sf_dir)
    app = spark.sparkContext.applicationId
    if _BASE_ALIAS_STATE.get(app) != sf_dir:
        load_table(spark, sf_dir, "customer").createOrReplaceTempView(
            "customer_base")
        _BASE_ALIAS_STATE[app] = sf_dir

_DATE_LO, _DATE_HI = "1995-01-01", "2001-12-31"

_SPARK_DERIVE = f"""
WITH date_dim AS (
  SELECT CAST(d AS DATE) AS d_date,
         datediff(CAST(d AS DATE), DATE '1992-01-01') + 2450000 AS d_date_sk,
         CAST(year(d) AS BIGINT) AS d_year,
         CAST(month(d) AS BIGINT) AS d_moy,
         CAST(day(d) AS BIGINT) AS d_dom,
         CAST(1200 + (year(d) - 1992) * 12 + month(d) - 1 AS INT)
             AS d_month_seq,
         CAST((datediff(CAST(d AS DATE), DATE '1992-01-01') + 3) % 7 AS INT)
             AS d_dow,
         CAST((month(d) - 1) div 3 + 1 AS INT) AS d_qoy,
         date_format(CAST(d AS DATE), 'EEEE') AS d_day_name,
         CAST(year(d) AS STRING) || 'Q' ||
             CAST((month(d) - 1) div 3 + 1 AS STRING) AS d_quarter_name,
         CAST((datediff(CAST(d AS DATE), DATE '1992-01-01') + 3) div 7
              + 5270 AS INT) AS d_week_seq
  FROM (SELECT explode(sequence(DATE '{_DATE_LO}', DATE '{_DATE_HI}',
                                INTERVAL 1 DAY)) AS d)
),
item AS (
  SELECT p_partkey AS i_item_sk,
         p_brand AS i_brand,
         CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
         p_type AS i_category,
         CAST(p_size % 10 + 1 AS INT) AS i_category_id,
         CAST(p_partkey % 500 AS INT) AS i_manufact_id,
         CAST(p_partkey % 40 + 1 AS INT) AS i_manager_id,
         'I' || lpad(CAST(p_partkey AS STRING), 9, '0') AS i_item_id,
         p_name AS i_item_desc,
         'CLASS#' || CAST(p_partkey % 7 AS STRING) AS i_class,
         CAST(p_partkey % 7 + 1 AS INT) AS i_class_id,
         'MFG#' || CAST(p_partkey % 500 AS STRING) AS i_manufact,
         CASE p_partkey % 8 WHEN 0 THEN 'orchid' WHEN 1 THEN 'chiffon'
              WHEN 2 THEN 'lace' WHEN 3 THEN 'navy' WHEN 4 THEN 'salmon'
              WHEN 5 THEN 'peru' WHEN 6 THEN 'ivory'
              ELSE 'slate' END AS i_color,
         p_retailprice AS i_current_price,
         p_retailprice * 0.6 AS i_wholesale_cost,
         p_name AS i_product_name,
         CASE p_partkey % 6 WHEN 0 THEN 'Pound' WHEN 1 THEN 'Lb'
              WHEN 2 THEN 'Each' WHEN 3 THEN 'Oz' WHEN 4 THEN 'Box'
              ELSE 'Unknown' END AS i_units,
         CASE p_size % 5 WHEN 0 THEN 'petite' WHEN 1 THEN 'medium'
              WHEN 2 THEN 'small' WHEN 3 THEN 'large'
              ELSE 'N/A' END AS i_size
  FROM part
),
store_sales AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             AS ss_sold_date_sk,
         l_partkey AS ss_item_sk,
         l_extendedprice AS ss_ext_sales_price,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS ss_sold_time_sk,
         CASE WHEN (l_orderkey * 13 + l_linenumber) % 47 = 0 THEN NULL
              ELSE CAST(o_custkey % 7200 + 1 AS INT) END AS ss_hdemo_sk,
         CAST(l_suppkey % 10 + 1 AS INT) AS ss_store_sk,
         l_orderkey AS ss_ticket_number,
         o_custkey AS ss_customer_sk,
         CASE WHEN (l_orderkey * 31 + l_linenumber) % 37 = 0 THEN NULL
              ELSE o_custkey + l_linenumber % 2 END AS ss_addr_sk,
         l_extendedprice + l_tax AS ss_ext_list_price,
         l_tax AS ss_ext_tax,
         l_extendedprice - l_quantity AS ss_net_profit,
         CAST((o_custkey + l_linenumber * 7) % 1000 + 1 AS INT) AS ss_cdemo_sk,
         CAST(l_partkey % 300 + 1 AS INT) AS ss_promo_sk,
         l_quantity AS ss_quantity,
         l_extendedprice AS ss_list_price,
         l_extendedprice * 0.6 AS ss_ext_wholesale_cost,
         l_extendedprice * 0.006 AS ss_wholesale_cost,
         l_discount * l_quantity AS ss_ext_discount_amt,
         l_extendedprice - l_discount AS ss_net_paid,
         l_discount AS ss_coupon_amt,
         l_tax AS ss_sales_price
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
),
time_dim AS (
  SELECT id AS t_time_sk, id AS t_time, CAST(id div 3600 AS INT) AS t_hour,
         CAST((id % 3600) div 60 AS INT) AS t_minute,
         CAST(id % 60 AS INT) AS t_second,
         CASE WHEN id >= 6*3600 AND id < 9*3600 THEN 'breakfast'
              WHEN id >= 17*3600 AND id < 20*3600 THEN 'dinner'
              ELSE NULL END AS t_meal_time
  FROM (SELECT explode(sequence(0, 86399)) AS id)
),
household_demographics AS (
  SELECT id AS hd_demo_sk, CAST(id % 10 AS INT) AS hd_dep_count,
         CAST(id % 20 + 1 AS INT) AS hd_income_band_sk,
         CASE id % 5 WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000'
                     WHEN 2 THEN '1001-5000' WHEN 3 THEN '501-1000'
                     ELSE '0-500' END AS hd_buy_potential,
         CAST(id % 5 AS INT) AS hd_vehicle_count
  FROM (SELECT explode(sequence(1, 7200)) AS id)
),
store AS (
  SELECT id AS s_store_sk, 'store_' || CAST(id AS STRING) AS s_store_name,
         'S' || lpad(CAST(id AS STRING), 4, '0') AS s_store_id,
         'Company_' || CAST(id % 3 AS STRING) AS s_company_name,
         CAST(id % 3 AS INT) AS s_company_id,
         CAST(id * 7 AS STRING) AS s_street_number,
         CASE id % 4 WHEN 0 THEN 'Main' WHEN 1 THEN 'Oak'
              WHEN 2 THEN 'Cedar' ELSE 'Elm' END AS s_street_name,
         CASE id % 3 WHEN 0 THEN 'St' WHEN 1 THEN 'Ave'
              ELSE 'Blvd' END AS s_street_type,
         'Suite ' || CAST(id * 10 AS STRING) AS s_suite_number,
         CASE id % 5 WHEN 0 THEN 'SD' WHEN 1 THEN 'MO' WHEN 2 THEN 'GA'
              WHEN 3 THEN 'AL' ELSE 'TN' END AS s_state,
         CAST(CASE WHEN id % 2 = 0 THEN -6 ELSE -7 END AS INT)
             AS s_gmt_offset,
         lpad(CAST(id % 97 * 131 AS STRING), 5, '0') || '-' ||
             CAST(id % 13 AS STRING) AS s_zip,
         CAST(id % 3 + 6 AS INT) AS s_market_id,
         CAST(150 + id * 15 AS INT) AS s_number_employees,
         CASE id % 5 WHEN 0 THEN 'Oakland' WHEN 1 THEN 'Riverside'
             WHEN 2 THEN 'Georgetown' WHEN 3 THEN 'Springfield'
             ELSE 'Fairview' END AS s_city,
         CASE id % 10 WHEN 0 THEN 'Daviess County'
             WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
             WHEN 3 THEN 'Luce County' WHEN 4 THEN 'Fairfield County'
             WHEN 5 THEN 'Richland County' WHEN 6 THEN 'Ziebach County'
             WHEN 7 THEN 'Walker County' WHEN 8 THEN 'Other County A'
             ELSE 'Other County B' END AS s_county
  FROM (SELECT explode(sequence(1, 10)) AS id)
),
customer AS (
  SELECT c_custkey AS c_customer_sk,
         'C' || lpad(CAST(c_custkey AS STRING), 15, '0') AS c_customer_id,
         'CF' || CAST(c_custkey % 97 AS STRING) AS c_first_name,
         'CL' || CAST(c_custkey % 701 AS STRING) AS c_last_name,
         CASE c_custkey % 6 WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
              WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss'
              ELSE 'Sir' END AS c_salutation,
         CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END
             AS c_preferred_cust_flag,
         'COUNTRY_' || CAST(c_custkey % 20 AS STRING) AS c_birth_country,
         'login_' || CAST(c_custkey % 53 AS STRING) AS c_login,
         'e' || CAST(c_custkey AS STRING) || '@example.com'
             AS c_email_address,
         CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
         CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
         CAST(1924 + c_custkey % 70 AS INT) AS c_birth_year,
         CAST(2450000 + c_custkey % 2500 AS INT) AS c_last_review_date_sk,
         CAST(2451096 + c_custkey % 2400 AS INT) AS c_first_sales_date_sk,
         CAST(2451096 + c_custkey % 2400 + 30 AS INT)
             AS c_first_shipto_date_sk,
         CAST(c_custkey % 1000 + 1 AS INT) AS c_current_cdemo_sk,
         CAST((c_custkey * 7 + 3) % 7200 + 1 AS INT) AS c_current_hdemo_sk,
         c_custkey AS c_current_addr_sk
  FROM customer_base
),
customer_address AS (
  SELECT c_custkey AS ca_address_sk,
         lpad(CAST(c_custkey % 97 * 131 AS STRING), 5, '0') || '-' ||
             CAST(c_custkey % 13 AS STRING) AS ca_zip,
         'city_' || CAST(c_custkey % 19 AS STRING) AS ca_city,
         CASE c_custkey % 7 WHEN 0 THEN 'CA' WHEN 1 THEN 'WA'
              WHEN 2 THEN 'GA' WHEN 3 THEN 'TX' WHEN 4 THEN 'NY'
              WHEN 5 THEN 'OH' ELSE 'FL' END AS ca_state,
         'county_' || CAST(c_custkey % 11 AS STRING) AS ca_county,
         'United States' AS ca_country,
         CAST(c_custkey % 999 + 1 AS STRING) AS ca_street_number,
         CASE c_custkey % 4 WHEN 0 THEN 'Main' WHEN 1 THEN 'Oak'
              WHEN 2 THEN 'Cedar' ELSE 'Elm' END AS ca_street_name,
         CASE c_custkey % 3 WHEN 0 THEN 'St' WHEN 1 THEN 'Ave'
              ELSE 'Blvd' END AS ca_street_type,
         'Suite ' || CAST(c_custkey % 90 AS STRING) AS ca_suite_number,
         CASE c_custkey % 3 WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
              ELSE 'single family' END AS ca_location_type,
         CAST(-8 + c_custkey % 3 AS INT) AS ca_gmt_offset
  FROM customer_base
),
customer_demographics AS (
  SELECT id AS cd_demo_sk,
         CASE WHEN id % 2 = 0 THEN 'F' ELSE 'M' END AS cd_gender,
         CASE id % 5 WHEN 0 THEN 'S' WHEN 1 THEN 'M' WHEN 2 THEN 'W'
                     WHEN 3 THEN 'D' ELSE 'U' END AS cd_marital_status,
         CASE id % 7 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
                     WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree'
                     WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree'
                     ELSE 'Unknown' END AS cd_education_status,
         CAST(id % 20 * 500 + 500 AS INT) AS cd_purchase_estimate,
         CASE id % 4 WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good'
              WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating,
         CAST(id % 7 AS INT) AS cd_dep_count,
         CAST(id % 5 AS INT) AS cd_dep_employed_count,
         CAST(id % 3 AS INT) AS cd_dep_college_count
  FROM (SELECT explode(sequence(1, 1000)) AS id)
),
promotion AS (
  SELECT id AS p_promo_sk,
         CASE WHEN id % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         CASE WHEN id % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
         CASE WHEN id % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN id % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM (SELECT explode(sequence(1, 300)) AS id)
),
catalog_page AS (
  SELECT id AS cp_catalog_page_sk,
         'CP' || lpad(CAST(id AS STRING), 5, '0') AS cp_catalog_page_id
  FROM (SELECT explode(sequence(1, 200)) AS id)
),
web_sales AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             AS ws_sold_date_sk,
         l_partkey AS ws_item_sk,
         l_extendedprice AS ws_ext_sales_price,
         o_custkey AS ws_bill_customer_sk,
         o_custkey + l_linenumber % 2 AS ws_bill_addr_sk,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS ws_sold_time_sk,
         l_tax AS ws_sales_price,
         l_quantity AS ws_quantity,
         datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 11 + l_linenumber * 31) % 150 AS INT)
             AS ws_ship_date_sk,
         CAST(l_suppkey % 5 + 1 AS INT) AS ws_warehouse_sk,
         CAST(l_partkey % 20 + 1 AS INT) AS ws_ship_mode_sk,
         CAST(l_orderkey % 30 + 1 AS INT) AS ws_web_site_sk,
         l_extendedprice - l_discount AS ws_net_paid,
         l_extendedprice + l_tax AS ws_ext_list_price,
         l_extendedprice * 0.6 AS ws_ext_wholesale_cost,
         l_discount * l_quantity AS ws_ext_discount_amt,
         l_orderkey AS ws_order_number,
         l_extendedprice * 0.02 AS ws_ext_ship_cost,
         CAST(l_partkey % 300 + 1 AS INT) AS ws_promo_sk,
         l_extendedprice AS ws_list_price,
         l_extendedprice * 0.006 AS ws_wholesale_cost,
         l_extendedprice - l_discount + l_tax AS ws_net_paid_inc_tax,
         o_custkey + l_linenumber % 2 AS ws_ship_addr_sk,
         CAST(o_custkey % 7200 + 1 AS INT) AS ws_ship_hdemo_sk,
         CASE WHEN (l_orderkey * 7 + l_linenumber) % 41 = 0 THEN NULL
              ELSE CAST(l_orderkey % 12 + 1 AS INT) END
             AS ws_web_page_sk,
         l_extendedprice - l_quantity AS ws_net_profit
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 1
),
catalog_sales AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             AS cs_sold_date_sk,
         l_partkey AS cs_item_sk,
         l_extendedprice AS cs_ext_sales_price,
         CAST(o_custkey % 1000 + 1 AS INT) AS cs_bill_cdemo_sk,
         o_custkey AS cs_bill_customer_sk,
         o_custkey + l_linenumber % 2 AS cs_bill_addr_sk,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS cs_sold_time_sk,
         CAST(l_partkey % 300 + 1 AS INT) AS cs_promo_sk,
         l_quantity AS cs_quantity,
         l_extendedprice AS cs_list_price,
         l_discount AS cs_coupon_amt,
         l_tax AS cs_sales_price,
         datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 17 + l_linenumber * 43) % 150 AS INT)
             AS cs_ship_date_sk,
         CASE WHEN (l_orderkey * 11 + l_linenumber) % 43 = 0 THEN NULL
              ELSE CAST(l_suppkey % 5 + 1 AS INT) END
             AS cs_warehouse_sk,
         CAST(l_partkey % 20 + 1 AS INT) AS cs_ship_mode_sk,
         CAST(o_custkey % 6 + 1 AS INT) AS cs_call_center_sk,
         l_extendedprice - l_discount AS cs_net_paid,
         l_extendedprice - l_quantity AS cs_net_profit,
         l_orderkey AS cs_order_number,
         l_extendedprice * 0.02 AS cs_ext_ship_cost,
         o_custkey + l_linenumber % 2 AS cs_ship_addr_sk,
         o_custkey AS cs_ship_customer_sk,
         l_extendedprice + l_tax AS cs_ext_list_price,
         l_extendedprice * 0.6 AS cs_ext_wholesale_cost,
         l_discount * l_quantity AS cs_ext_discount_amt,
         CAST((l_orderkey * 3 + l_partkey) % 200 + 1 AS INT)
             AS cs_catalog_page_sk,
         l_extendedprice * 0.006 AS cs_wholesale_cost,
         l_extendedprice - l_discount + l_tax AS cs_net_paid_inc_tax,
         CAST((o_custkey * 31 + l_linenumber * 11) % 7200 + 1 AS INT)
             AS cs_bill_hdemo_sk
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 2
),
warehouse AS (
  SELECT id AS w_warehouse_sk,
         'Warehouse number ' || CAST(id AS STRING) AS w_warehouse_name,
         CAST(10000 + id * 5000 AS INT) AS w_warehouse_sq_ft,
         CASE id % 5 WHEN 0 THEN 'Oakland' WHEN 1 THEN 'Riverside'
              WHEN 2 THEN 'Georgetown' WHEN 3 THEN 'Springfield'
              ELSE 'Fairview' END AS w_city,
         CASE id % 5 WHEN 0 THEN 'Daviess County'
              WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
              WHEN 3 THEN 'Luce County'
              ELSE 'Fairfield County' END AS w_county,
         'United States' AS w_country,
         CASE id % 5 WHEN 0 THEN 'CA' WHEN 1 THEN 'WA' WHEN 2 THEN 'TX'
              WHEN 3 THEN 'NY' ELSE 'GA' END AS w_state
  FROM (SELECT explode(sequence(1, 5)) AS id)
),
ship_mode AS (
  SELECT id AS sm_ship_mode_sk,
         CASE id % 5 WHEN 0 THEN 'DIAMOND' WHEN 1 THEN 'AIRBORNE'
              WHEN 2 THEN 'UPS' WHEN 3 THEN 'FEDEX'
              ELSE 'ZOUROS' END AS sm_carrier,
         CASE id % 5 WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'OVERNIGHT'
              WHEN 2 THEN 'REGULAR' WHEN 3 THEN 'TWO DAY'
              ELSE 'LIBRARY' END AS sm_type
  FROM (SELECT explode(sequence(1, 20)) AS id)
),
web_site AS (
  SELECT id AS web_site_sk,
         'WS' || lpad(CAST(id AS STRING), 4, '0') AS web_site_id,
         'site_' || CAST(id % 6 AS STRING) AS web_name,
         CASE WHEN id % 2 = 0 THEN 'pri' ELSE 'able' END
             AS web_company_name
  FROM (SELECT explode(sequence(1, 30)) AS id)
),
call_center AS (
  SELECT id AS cc_call_center_sk,
         'CC' || lpad(CAST(id AS STRING), 3, '0') AS cc_call_center_id,
         'Manager_' || CAST(id % 4 AS STRING) AS cc_manager,
         'call_center_' || CAST(id AS STRING) AS cc_name,
         CASE id % 5 WHEN 0 THEN 'Daviess County'
              WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
              WHEN 3 THEN 'Luce County'
              ELSE 'Fairfield County' END AS cc_county
  FROM (SELECT explode(sequence(1, 6)) AS id)
),
web_page AS (
  SELECT id AS wp_web_page_sk,
         CAST(4800 + id * 40 AS INT) AS wp_char_count
  FROM (SELECT explode(sequence(1, 12)) AS id)
),
income_band AS (
  SELECT id AS ib_income_band_sk,
         CAST((id - 1) * 10000 AS INT) AS ib_lower_bound,
         CAST(id * 10000 AS INT) AS ib_upper_bound
  FROM (SELECT explode(sequence(1, 20)) AS id)
),
store_returns AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 13 + l_linenumber * 17) % 90 AS INT)
             AS sr_returned_date_sk,
         o_custkey AS sr_customer_sk,
         CAST(l_suppkey % 10 + 1 AS INT) AS sr_store_sk,
         l_partkey AS sr_item_sk,
         l_orderkey AS sr_ticket_number,
         l_tax AS sr_fee,
         l_quantity AS sr_return_quantity,
         l_extendedprice * 0.1 AS sr_return_amt,
         l_extendedprice * 0.05 + l_tax AS sr_net_loss,
         CAST(o_custkey % 1000 + 1 AS INT) AS sr_cdemo_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS sr_reason_sk
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
),
inventory AS (
  SELECT p_partkey AS inv_item_sk,
         datediff(CAST(wd AS DATE), DATE '1992-01-01') + 2450000
             AS inv_date_sk,
         CAST(p_partkey % 5 + 1 AS INT) AS inv_warehouse_sk,
         CAST((p_partkey * 7 + datediff(CAST(wd AS DATE), DATE '1992-01-01'))
              % 1000 AS INT) AS inv_quantity_on_hand
  FROM part
  CROSS JOIN (SELECT explode(sequence(DATE '1995-01-03', DATE '2001-12-31',
                                      INTERVAL 7 DAY)) AS wd)
),
reason AS (
  SELECT id AS r_reason_sk,
         CASE id WHEN 1 THEN 'Did not like the warranty'
                 WHEN 2 THEN 'Wrong size'
                 WHEN 3 THEN 'Found a better price'
                 ELSE 'reason_' || CAST(id AS STRING) END AS r_reason_desc
  FROM (SELECT explode(sequence(1, 35)) AS id)
),
web_returns AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 19 + l_linenumber * 23) % 90 AS INT)
             AS wr_returned_date_sk,
         l_partkey AS wr_item_sk,
         l_orderkey AS wr_order_number,
         o_custkey AS wr_returning_customer_sk,
         o_custkey + l_linenumber % 2 AS wr_returning_addr_sk,
         l_quantity AS wr_return_quantity,
         l_extendedprice * 0.1 AS wr_return_amt,
         l_extendedprice * 0.05 + l_tax AS wr_net_loss,
         CAST(l_orderkey % 12 + 1 AS INT) AS wr_web_page_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS wr_reason_sk,
         l_extendedprice * 0.12 AS wr_refunded_cash,
         l_tax AS wr_fee,
         CAST(o_custkey % 1000 + 1 AS INT) AS wr_refunded_cdemo_sk,
         CAST((o_custkey + 1) % 1000 + 1 AS INT) AS wr_returning_cdemo_sk,
         o_custkey + l_linenumber % 2 AS wr_refunded_addr_sk
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 1 AND l_returnflag = 'R'
),
catalog_returns AS (
  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 29 + l_linenumber * 37) % 90 AS INT)
             AS cr_returned_date_sk,
         l_partkey AS cr_item_sk,
         l_orderkey AS cr_order_number,
         o_custkey AS cr_returning_customer_sk,
         o_custkey + l_linenumber % 2 AS cr_returning_addr_sk,
         l_quantity AS cr_return_quantity,
         l_extendedprice * 0.1 AS cr_return_amount,
         l_extendedprice * 0.1 + l_tax AS cr_return_amt_inc_tax,
         l_extendedprice * 0.05 + l_tax AS cr_net_loss,
         CAST(o_custkey % 6 + 1 AS INT) AS cr_call_center_sk,
         CAST(l_suppkey % 5 + 1 AS INT) AS cr_warehouse_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS cr_reason_sk,
         l_extendedprice * 0.08 AS cr_refunded_cash,
         CAST((l_orderkey * 3 + l_partkey) % 200 + 1 AS INT)
             AS cr_catalog_page_sk,
         l_extendedprice * 0.015 AS cr_reversed_charge,
         l_extendedprice * 0.01 AS cr_store_credit
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 2 AND l_returnflag = 'R'
)
"""

_DUCK_DERIVE = f"""
WITH date_dim AS (
  SELECT CAST(d AS DATE) AS d_date,
         (CAST(d AS DATE) - DATE '1992-01-01') + 2450000 AS d_date_sk,
         year(d) AS d_year, month(d) AS d_moy, day(d) AS d_dom,
         CAST(1200 + (year(d) - 1992) * 12 + month(d) - 1 AS INT)
             AS d_month_seq,
         CAST(((CAST(d AS DATE) - DATE '1992-01-01') + 3) % 7 AS INT)
             AS d_dow,
         CAST((month(d) - 1) // 3 + 1 AS INT) AS d_qoy,
         dayname(CAST(d AS DATE)) AS d_day_name,
         CAST(year(d) AS VARCHAR) || 'Q' ||
             CAST((month(d) - 1) // 3 + 1 AS VARCHAR) AS d_quarter_name,
         CAST(((CAST(d AS DATE) - DATE '1992-01-01') + 3) // 7
              + 5270 AS INT) AS d_week_seq
  FROM (SELECT unnest(generate_series(DATE '{_DATE_LO}', DATE '{_DATE_HI}',
                                      INTERVAL '1 day')) AS d) t
),
item AS (
  SELECT p_partkey AS i_item_sk,
         p_brand AS i_brand,
         CAST(SUBSTR(p_brand, 7) AS INT) AS i_brand_id,
         p_type AS i_category,
         CAST(p_size % 10 + 1 AS INT) AS i_category_id,
         CAST(p_partkey % 500 AS INT) AS i_manufact_id,
         CAST(p_partkey % 40 + 1 AS INT) AS i_manager_id,
         'I' || lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS i_item_id,
         p_name AS i_item_desc,
         'CLASS#' || CAST(p_partkey % 7 AS VARCHAR) AS i_class,
         CAST(p_partkey % 7 + 1 AS INT) AS i_class_id,
         'MFG#' || CAST(p_partkey % 500 AS VARCHAR) AS i_manufact,
         CASE p_partkey % 8 WHEN 0 THEN 'orchid' WHEN 1 THEN 'chiffon'
              WHEN 2 THEN 'lace' WHEN 3 THEN 'navy' WHEN 4 THEN 'salmon'
              WHEN 5 THEN 'peru' WHEN 6 THEN 'ivory'
              ELSE 'slate' END AS i_color,
         p_retailprice AS i_current_price,
         p_retailprice * 0.6 AS i_wholesale_cost,
         p_name AS i_product_name,
         CASE p_partkey % 6 WHEN 0 THEN 'Pound' WHEN 1 THEN 'Lb'
              WHEN 2 THEN 'Each' WHEN 3 THEN 'Oz' WHEN 4 THEN 'Box'
              ELSE 'Unknown' END AS i_units,
         CASE p_size % 5 WHEN 0 THEN 'petite' WHEN 1 THEN 'medium'
              WHEN 2 THEN 'small' WHEN 3 THEN 'large'
              ELSE 'N/A' END AS i_size
  FROM part
),
store_sales AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             AS ss_sold_date_sk,
         l_partkey AS ss_item_sk,
         l_extendedprice AS ss_ext_sales_price,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS ss_sold_time_sk,
         CASE WHEN (l_orderkey * 13 + l_linenumber) % 47 = 0 THEN NULL
              ELSE CAST(o_custkey % 7200 + 1 AS INT) END AS ss_hdemo_sk,
         CAST(l_suppkey % 10 + 1 AS INT) AS ss_store_sk,
         l_orderkey AS ss_ticket_number,
         o_custkey AS ss_customer_sk,
         CASE WHEN (l_orderkey * 31 + l_linenumber) % 37 = 0 THEN NULL
              ELSE o_custkey + l_linenumber % 2 END AS ss_addr_sk,
         l_extendedprice + l_tax AS ss_ext_list_price,
         l_tax AS ss_ext_tax,
         l_extendedprice - l_quantity AS ss_net_profit,
         CAST((o_custkey + l_linenumber * 7) % 1000 + 1 AS INT) AS ss_cdemo_sk,
         CAST(l_partkey % 300 + 1 AS INT) AS ss_promo_sk,
         l_quantity AS ss_quantity,
         l_extendedprice AS ss_list_price,
         l_extendedprice * 0.6 AS ss_ext_wholesale_cost,
         l_extendedprice * 0.006 AS ss_wholesale_cost,
         l_discount * l_quantity AS ss_ext_discount_amt,
         l_extendedprice - l_discount AS ss_net_paid,
         l_discount AS ss_coupon_amt,
         l_tax AS ss_sales_price
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
time_dim AS (
  SELECT id AS t_time_sk, id AS t_time, CAST(id // 3600 AS INT) AS t_hour,
         CAST((id % 3600) // 60 AS INT) AS t_minute,
         CAST(id % 60 AS INT) AS t_second,
         CASE WHEN id >= 6*3600 AND id < 9*3600 THEN 'breakfast'
              WHEN id >= 17*3600 AND id < 20*3600 THEN 'dinner'
              ELSE NULL END AS t_meal_time
  FROM range(0, 86400) t(id)
),
household_demographics AS (
  SELECT id AS hd_demo_sk, CAST(id % 10 AS INT) AS hd_dep_count,
         CAST(id % 20 + 1 AS INT) AS hd_income_band_sk,
         CASE id % 5 WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000'
                     WHEN 2 THEN '1001-5000' WHEN 3 THEN '501-1000'
                     ELSE '0-500' END AS hd_buy_potential,
         CAST(id % 5 AS INT) AS hd_vehicle_count
  FROM range(1, 7201) t(id)
),
store AS (
  SELECT id AS s_store_sk, 'store_' || CAST(id AS VARCHAR) AS s_store_name,
         'S' || lpad(CAST(id AS VARCHAR), 4, '0') AS s_store_id,
         'Company_' || CAST(id % 3 AS VARCHAR) AS s_company_name,
         CAST(id % 3 AS INT) AS s_company_id,
         CAST(id * 7 AS VARCHAR) AS s_street_number,
         CASE id % 4 WHEN 0 THEN 'Main' WHEN 1 THEN 'Oak'
              WHEN 2 THEN 'Cedar' ELSE 'Elm' END AS s_street_name,
         CASE id % 3 WHEN 0 THEN 'St' WHEN 1 THEN 'Ave'
              ELSE 'Blvd' END AS s_street_type,
         'Suite ' || CAST(id * 10 AS VARCHAR) AS s_suite_number,
         CASE id % 5 WHEN 0 THEN 'SD' WHEN 1 THEN 'MO' WHEN 2 THEN 'GA'
              WHEN 3 THEN 'AL' ELSE 'TN' END AS s_state,
         CAST(CASE WHEN id % 2 = 0 THEN -6 ELSE -7 END AS INT)
             AS s_gmt_offset,
         lpad(CAST(id % 97 * 131 AS VARCHAR), 5, '0') || '-' ||
             CAST(id % 13 AS VARCHAR) AS s_zip,
         CAST(id % 3 + 6 AS INT) AS s_market_id,
         CAST(150 + id * 15 AS INT) AS s_number_employees,
         CASE id % 5 WHEN 0 THEN 'Oakland' WHEN 1 THEN 'Riverside'
             WHEN 2 THEN 'Georgetown' WHEN 3 THEN 'Springfield'
             ELSE 'Fairview' END AS s_city,
         CASE id % 10 WHEN 0 THEN 'Daviess County'
             WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
             WHEN 3 THEN 'Luce County' WHEN 4 THEN 'Fairfield County'
             WHEN 5 THEN 'Richland County' WHEN 6 THEN 'Ziebach County'
             WHEN 7 THEN 'Walker County' WHEN 8 THEN 'Other County A'
             ELSE 'Other County B' END AS s_county
  FROM range(1, 11) t(id)
),
customer AS (
  SELECT c_custkey AS c_customer_sk,
         'C' || lpad(CAST(c_custkey AS VARCHAR), 15, '0') AS c_customer_id,
         'CF' || CAST(c_custkey % 97 AS VARCHAR) AS c_first_name,
         'CL' || CAST(c_custkey % 701 AS VARCHAR) AS c_last_name,
         CASE c_custkey % 6 WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
              WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss'
              ELSE 'Sir' END AS c_salutation,
         CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END
             AS c_preferred_cust_flag,
         'COUNTRY_' || CAST(c_custkey % 20 AS VARCHAR) AS c_birth_country,
         'login_' || CAST(c_custkey % 53 AS VARCHAR) AS c_login,
         'e' || CAST(c_custkey AS VARCHAR) || '@example.com'
             AS c_email_address,
         CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
         CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
         CAST(1924 + c_custkey % 70 AS INT) AS c_birth_year,
         CAST(2450000 + c_custkey % 2500 AS INT) AS c_last_review_date_sk,
         CAST(2451096 + c_custkey % 2400 AS INT) AS c_first_sales_date_sk,
         CAST(2451096 + c_custkey % 2400 + 30 AS INT)
             AS c_first_shipto_date_sk,
         CAST(c_custkey % 1000 + 1 AS INT) AS c_current_cdemo_sk,
         CAST((c_custkey * 7 + 3) % 7200 + 1 AS INT) AS c_current_hdemo_sk,
         c_custkey AS c_current_addr_sk
  FROM main.customer
),
customer_address AS (
  SELECT c_custkey AS ca_address_sk,
         lpad(CAST(c_custkey % 97 * 131 AS VARCHAR), 5, '0') || '-' ||
             CAST(c_custkey % 13 AS VARCHAR) AS ca_zip,
         'city_' || CAST(c_custkey % 19 AS VARCHAR) AS ca_city,
         CASE c_custkey % 7 WHEN 0 THEN 'CA' WHEN 1 THEN 'WA'
              WHEN 2 THEN 'GA' WHEN 3 THEN 'TX' WHEN 4 THEN 'NY'
              WHEN 5 THEN 'OH' ELSE 'FL' END AS ca_state,
         'county_' || CAST(c_custkey % 11 AS VARCHAR) AS ca_county,
         'United States' AS ca_country,
         CAST(c_custkey % 999 + 1 AS VARCHAR) AS ca_street_number,
         CASE c_custkey % 4 WHEN 0 THEN 'Main' WHEN 1 THEN 'Oak'
              WHEN 2 THEN 'Cedar' ELSE 'Elm' END AS ca_street_name,
         CASE c_custkey % 3 WHEN 0 THEN 'St' WHEN 1 THEN 'Ave'
              ELSE 'Blvd' END AS ca_street_type,
         'Suite ' || CAST(c_custkey % 90 AS VARCHAR) AS ca_suite_number,
         CASE c_custkey % 3 WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
              ELSE 'single family' END AS ca_location_type,
         CAST(-8 + c_custkey % 3 AS INT) AS ca_gmt_offset
  FROM main.customer
),
customer_demographics AS (
  SELECT id AS cd_demo_sk,
         CASE WHEN id % 2 = 0 THEN 'F' ELSE 'M' END AS cd_gender,
         CASE id % 5 WHEN 0 THEN 'S' WHEN 1 THEN 'M' WHEN 2 THEN 'W'
                     WHEN 3 THEN 'D' ELSE 'U' END AS cd_marital_status,
         CASE id % 7 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
                     WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree'
                     WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree'
                     ELSE 'Unknown' END AS cd_education_status,
         CAST(id % 20 * 500 + 500 AS INT) AS cd_purchase_estimate,
         CASE id % 4 WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good'
              WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating,
         CAST(id % 7 AS INT) AS cd_dep_count,
         CAST(id % 5 AS INT) AS cd_dep_employed_count,
         CAST(id % 3 AS INT) AS cd_dep_college_count
  FROM range(1, 1001) t(id)
),
promotion AS (
  SELECT id AS p_promo_sk,
         CASE WHEN id % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         CASE WHEN id % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
         CASE WHEN id % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN id % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM range(1, 301) t(id)
),
catalog_page AS (
  SELECT id AS cp_catalog_page_sk,
         'CP' || lpad(CAST(id AS VARCHAR), 5, '0') AS cp_catalog_page_id
  FROM range(1, 201) t(id)
),
web_sales AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             AS ws_sold_date_sk,
         l_partkey AS ws_item_sk,
         l_extendedprice AS ws_ext_sales_price,
         o_custkey AS ws_bill_customer_sk,
         o_custkey + l_linenumber % 2 AS ws_bill_addr_sk,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS ws_sold_time_sk,
         l_tax AS ws_sales_price,
         l_quantity AS ws_quantity,
         (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 11 + l_linenumber * 31) % 150 AS INT)
             AS ws_ship_date_sk,
         CAST(l_suppkey % 5 + 1 AS INT) AS ws_warehouse_sk,
         CAST(l_partkey % 20 + 1 AS INT) AS ws_ship_mode_sk,
         CAST(l_orderkey % 30 + 1 AS INT) AS ws_web_site_sk,
         l_extendedprice - l_discount AS ws_net_paid,
         l_extendedprice + l_tax AS ws_ext_list_price,
         l_extendedprice * 0.6 AS ws_ext_wholesale_cost,
         l_discount * l_quantity AS ws_ext_discount_amt,
         l_orderkey AS ws_order_number,
         l_extendedprice * 0.02 AS ws_ext_ship_cost,
         CAST(l_partkey % 300 + 1 AS INT) AS ws_promo_sk,
         l_extendedprice AS ws_list_price,
         l_extendedprice * 0.006 AS ws_wholesale_cost,
         l_extendedprice - l_discount + l_tax AS ws_net_paid_inc_tax,
         o_custkey + l_linenumber % 2 AS ws_ship_addr_sk,
         CAST(o_custkey % 7200 + 1 AS INT) AS ws_ship_hdemo_sk,
         CASE WHEN (l_orderkey * 7 + l_linenumber) % 41 = 0 THEN NULL
              ELSE CAST(l_orderkey % 12 + 1 AS INT) END
             AS ws_web_page_sk,
         l_extendedprice - l_quantity AS ws_net_profit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 1
),
catalog_sales AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             AS cs_sold_date_sk,
         l_partkey AS cs_item_sk,
         l_extendedprice AS cs_ext_sales_price,
         CAST(o_custkey % 1000 + 1 AS INT) AS cs_bill_cdemo_sk,
         o_custkey AS cs_bill_customer_sk,
         o_custkey + l_linenumber % 2 AS cs_bill_addr_sk,
         CAST((l_orderkey * 7 + l_linenumber * 4973) % 86400 AS INT)
             AS cs_sold_time_sk,
         CAST(l_partkey % 300 + 1 AS INT) AS cs_promo_sk,
         l_quantity AS cs_quantity,
         l_extendedprice AS cs_list_price,
         l_discount AS cs_coupon_amt,
         l_tax AS cs_sales_price,
         (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 17 + l_linenumber * 43) % 150 AS INT)
             AS cs_ship_date_sk,
         CASE WHEN (l_orderkey * 11 + l_linenumber) % 43 = 0 THEN NULL
              ELSE CAST(l_suppkey % 5 + 1 AS INT) END
             AS cs_warehouse_sk,
         CAST(l_partkey % 20 + 1 AS INT) AS cs_ship_mode_sk,
         CAST(o_custkey % 6 + 1 AS INT) AS cs_call_center_sk,
         l_extendedprice - l_discount AS cs_net_paid,
         l_extendedprice - l_quantity AS cs_net_profit,
         l_orderkey AS cs_order_number,
         l_extendedprice * 0.02 AS cs_ext_ship_cost,
         o_custkey + l_linenumber % 2 AS cs_ship_addr_sk,
         o_custkey AS cs_ship_customer_sk,
         l_extendedprice + l_tax AS cs_ext_list_price,
         l_extendedprice * 0.6 AS cs_ext_wholesale_cost,
         l_discount * l_quantity AS cs_ext_discount_amt,
         CAST((l_orderkey * 3 + l_partkey) % 200 + 1 AS INT)
             AS cs_catalog_page_sk,
         l_extendedprice * 0.006 AS cs_wholesale_cost,
         l_extendedprice - l_discount + l_tax AS cs_net_paid_inc_tax,
         CAST((o_custkey * 31 + l_linenumber * 11) % 7200 + 1 AS INT)
             AS cs_bill_hdemo_sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 2
),
warehouse AS (
  SELECT id AS w_warehouse_sk,
         'Warehouse number ' || CAST(id AS VARCHAR) AS w_warehouse_name,
         CAST(10000 + id * 5000 AS INT) AS w_warehouse_sq_ft,
         CASE id % 5 WHEN 0 THEN 'Oakland' WHEN 1 THEN 'Riverside'
              WHEN 2 THEN 'Georgetown' WHEN 3 THEN 'Springfield'
              ELSE 'Fairview' END AS w_city,
         CASE id % 5 WHEN 0 THEN 'Daviess County'
              WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
              WHEN 3 THEN 'Luce County'
              ELSE 'Fairfield County' END AS w_county,
         'United States' AS w_country,
         CASE id % 5 WHEN 0 THEN 'CA' WHEN 1 THEN 'WA' WHEN 2 THEN 'TX'
              WHEN 3 THEN 'NY' ELSE 'GA' END AS w_state
  FROM range(1, 6) t(id)
),
ship_mode AS (
  SELECT id AS sm_ship_mode_sk,
         CASE id % 5 WHEN 0 THEN 'DIAMOND' WHEN 1 THEN 'AIRBORNE'
              WHEN 2 THEN 'UPS' WHEN 3 THEN 'FEDEX'
              ELSE 'ZOUROS' END AS sm_carrier,
         CASE id % 5 WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'OVERNIGHT'
              WHEN 2 THEN 'REGULAR' WHEN 3 THEN 'TWO DAY'
              ELSE 'LIBRARY' END AS sm_type
  FROM range(1, 21) t(id)
),
web_site AS (
  SELECT id AS web_site_sk,
         'WS' || lpad(CAST(id AS VARCHAR), 4, '0') AS web_site_id,
         'site_' || CAST(id % 6 AS VARCHAR) AS web_name,
         CASE WHEN id % 2 = 0 THEN 'pri' ELSE 'able' END
             AS web_company_name
  FROM range(1, 31) t(id)
),
call_center AS (
  SELECT id AS cc_call_center_sk,
         'CC' || lpad(CAST(id AS VARCHAR), 3, '0') AS cc_call_center_id,
         'Manager_' || CAST(id % 4 AS VARCHAR) AS cc_manager,
         'call_center_' || CAST(id AS VARCHAR) AS cc_name,
         CASE id % 5 WHEN 0 THEN 'Daviess County'
              WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Barrow County'
              WHEN 3 THEN 'Luce County'
              ELSE 'Fairfield County' END AS cc_county
  FROM range(1, 7) t(id)
),
web_page AS (
  SELECT id AS wp_web_page_sk,
         CAST(4800 + id * 40 AS INT) AS wp_char_count
  FROM range(1, 13) t(id)
),
income_band AS (
  SELECT id AS ib_income_band_sk,
         CAST((id - 1) * 10000 AS INT) AS ib_lower_bound,
         CAST(id * 10000 AS INT) AS ib_upper_bound
  FROM range(1, 21) t(id)
),
store_returns AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 13 + l_linenumber * 17) % 90 AS INT)
             AS sr_returned_date_sk,
         o_custkey AS sr_customer_sk,
         CAST(l_suppkey % 10 + 1 AS INT) AS sr_store_sk,
         l_partkey AS sr_item_sk,
         l_orderkey AS sr_ticket_number,
         l_tax AS sr_fee,
         l_quantity AS sr_return_quantity,
         l_extendedprice * 0.1 AS sr_return_amt,
         l_extendedprice * 0.05 + l_tax AS sr_net_loss,
         CAST(o_custkey % 1000 + 1 AS INT) AS sr_cdemo_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS sr_reason_sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
),
inventory AS (
  SELECT p_partkey AS inv_item_sk,
         (CAST(wd AS DATE) - DATE '1992-01-01') + 2450000 AS inv_date_sk,
         CAST(p_partkey % 5 + 1 AS INT) AS inv_warehouse_sk,
         CAST((p_partkey * 7 + (CAST(wd AS DATE) - DATE '1992-01-01'))
              % 1000 AS INT) AS inv_quantity_on_hand
  FROM part
  CROSS JOIN (SELECT unnest(generate_series(DATE '1995-01-03',
                                            DATE '2001-12-31',
                                            INTERVAL '7 days')) AS wd) t
),
reason AS (
  SELECT id AS r_reason_sk,
         CASE id WHEN 1 THEN 'Did not like the warranty'
                 WHEN 2 THEN 'Wrong size'
                 WHEN 3 THEN 'Found a better price'
                 ELSE 'reason_' || CAST(id AS VARCHAR) END AS r_reason_desc
  FROM range(1, 36) t(id)
),
web_returns AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 19 + l_linenumber * 23) % 90 AS INT)
             AS wr_returned_date_sk,
         l_partkey AS wr_item_sk,
         l_orderkey AS wr_order_number,
         o_custkey AS wr_returning_customer_sk,
         o_custkey + l_linenumber % 2 AS wr_returning_addr_sk,
         l_quantity AS wr_return_quantity,
         l_extendedprice * 0.1 AS wr_return_amt,
         l_extendedprice * 0.05 + l_tax AS wr_net_loss,
         CAST(l_orderkey % 12 + 1 AS INT) AS wr_web_page_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS wr_reason_sk,
         l_extendedprice * 0.12 AS wr_refunded_cash,
         l_tax AS wr_fee,
         CAST(o_custkey % 1000 + 1 AS INT) AS wr_refunded_cdemo_sk,
         CAST((o_custkey + 1) % 1000 + 1 AS INT) AS wr_returning_cdemo_sk,
         o_custkey + l_linenumber % 2 AS wr_refunded_addr_sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 1 AND l_returnflag = 'R'
),
catalog_returns AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') + 2450000
             + CAST((l_orderkey * 29 + l_linenumber * 37) % 90 AS INT)
             AS cr_returned_date_sk,
         l_partkey AS cr_item_sk,
         l_orderkey AS cr_order_number,
         o_custkey AS cr_returning_customer_sk,
         o_custkey + l_linenumber % 2 AS cr_returning_addr_sk,
         l_quantity AS cr_return_quantity,
         l_extendedprice * 0.1 AS cr_return_amount,
         l_extendedprice * 0.1 + l_tax AS cr_return_amt_inc_tax,
         l_extendedprice * 0.05 + l_tax AS cr_net_loss,
         CAST(o_custkey % 6 + 1 AS INT) AS cr_call_center_sk,
         CAST(l_suppkey % 5 + 1 AS INT) AS cr_warehouse_sk,
         CAST(l_partkey % 35 + 1 AS INT) AS cr_reason_sk,
         l_extendedprice * 0.08 AS cr_refunded_cash,
         CAST((l_orderkey * 3 + l_partkey) % 200 + 1 AS INT)
             AS cr_catalog_page_sk,
         l_extendedprice * 0.015 AS cr_reversed_charge,
         l_extendedprice * 0.01 AS cr_store_credit
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 4 = 2 AND l_returnflag = 'R'
)
"""


# Representative TPC-DS bench subset (one per heavy plan family): the
# year_total CTE chain (q4), the 9-fact-pass cross-channel INTERSECT
# (q14), the top-k+count-rank triple-channel ranks (q49), the cumulative
# FULL OUTER window (q51), the 17-relation resale chain (q64), the
# 8-level rollup + per-category rank (q67), the no-return anti-join
# channels (q78), and the order-level EXISTS chain (q95) — tagged into
# bench.py so round-over-round regressions on the executed-TPC-DS
# surface are visible.
_BENCH_TPCDS = {"tpcds_q4", "tpcds_q14", "tpcds_q49", "tpcds_q51",
                "tpcds_q64", "tpcds_q67", "tpcds_q78", "tpcds_q95"}


def _split_ctes(derive_sql: str) -> list[tuple[str, str]]:
    """Split a ``WITH a AS (...), b AS (...)`` prelude into ordered
    (name, "name AS (...)") pairs via a paren-depth scan (no parens occur
    inside the derive's string literals; _ctes_cover_derive() pins that)."""
    rest = derive_sql[re.search(r"\bWITH\b", derive_sql).end():]
    out: list[tuple[str, str]] = []
    pat = re.compile(r"[\s,]*([a-z_]+)\s+AS\s+\(")
    i = 0
    while True:
        m = pat.match(rest, i)
        if not m:
            break
        depth, j = 1, m.end()
        while depth:
            if rest[j] == "(":
                depth += 1
            elif rest[j] == ")":
                depth -= 1
            j += 1
        out.append((m.group(1), rest[m.start(1):j]))
        i = j
    return out


_CTES = _split_ctes(_SPARK_DERIVE)
_CTE_NAMES = [n for n, _ in _CTES]
# inter-CTE references (none today — every derive reads parquet directly —
# but computed so a future edit can't silently break the closure)
_CTE_DEPS = {
    n: {m for m in _CTE_NAMES
        if m != n and re.search(rf"\b{re.escape(m)}\b", text)}
    for n, text in _CTES
}


def _pruned_prelude(body: str, cte_where: dict[str, str] | None = None) -> str:
    """The derive prelude restricted to the CTEs ``body`` references.

    spark.sql() re-analyzes its whole text on EVERY execution, and the full
    24-table derive costs ~2 s of single-threaded driver analysis per call
    (optimization guide §7.3: huge plans spend their time in the analyzer)
    — measured 1.9-2.8 s/run at sf0.1 against 0.8 s of actual execution.
    Dropping the unreferenced CTE definitions is result-identical (they are
    exactly what the analyzer itself would discard) and cuts the analyzed
    text to the tables the query touches.  A missed reference fails loudly
    (TABLE_OR_VIEW_NOT_FOUND), never silently.

    ``cte_where`` (r13, guide §2.3 "shuffle fewer bytes"): extra predicate
    appended to a named derive CTE, for pushing a date window the BODY
    already implies below the fact's base join (the body's d_* constraint
    reaches the fact only at the date_dim broadcast join — AFTER the
    lineitem⋈orders pass; sold_date_sk = f(o_orderdate) with f injective,
    so the o_orderdate window keeps exactly the rows that can survive).
    Each call site documents its implication; the DuckDB oracle runs the
    UNMODIFIED body and the rewritten==inline row pins in tests/
    test_plans.py enforce equivalence.
    """
    kept = _kept_ctes(body)
    if cte_where:
        missing = set(cte_where) - {n for n, _ in kept}
        assert not missing, f"cte_where targets not in closure: {missing}"
        kept = [(n, _append_where(text, n, cte_where[n]))
                if n in cte_where else (n, text) for n, text in kept]
    return "\nWITH " + ",\n".join(text for _, text in kept) + "\n"


def _append_where(text: str, name: str, pred: str) -> str:
    """CTE text with ``pred`` conjoined to its WHERE clause (the predicate
    references BASE-table columns like o_orderdate, which the CTE's
    projection drops — so it must land inside the CTE, not around it).
    Depth-aware scan for an existing top-level WHERE; the derive CTEs this
    targets are plain SELECT..FROM..[WHERE] shapes (asserted)."""
    prefix = f"{name} AS ("
    assert text.startswith(prefix) and text.rstrip().endswith(")"), text[:60]
    inner = text.rstrip()[len(prefix):-1]
    depth, has_where = 0, False
    for i, ch in enumerate(inner):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and inner[i:i + 6] == "WHERE " and (
                i == 0 or not (inner[i - 1].isalnum() or inner[i - 1] == "_")):
            has_where = True
    for kw in ("GROUP BY", "HAVING", "ORDER BY", "LIMIT"):
        d = 0
        for i, ch in enumerate(inner):
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
            assert not (d == 0 and inner[i:i + len(kw)] == kw), \
                f"{name}: cte_where cannot target a CTE with top-level {kw}"
    conj = "AND" if has_where else "WHERE"
    return f"{prefix}{inner}\n  {conj} ({pred})\n)"


def _kept_ctes(body: str) -> list[tuple[str, str]]:
    """The (name, text) derive CTEs ``body`` references, transitively,
    in original prelude order (the closure _pruned_prelude keeps)."""
    used = {n for n in _CTE_NAMES if re.search(rf"\b{re.escape(n)}\b", body)}
    frontier = list(used)
    while frontier:
        for dep in _CTE_DEPS[frontier.pop()]:
            if dep not in used:
                used.add(dep)
                frontier.append(dep)
    return [(n, text) for n, text in _CTES if n in used]


# raw body text per registered query — the inline spelling every rewrite
# must stay row-identical to (used by tests and same-JVM A/B harnesses)
_BODIES: dict[str, str] = {}


def _register(name: str, body: str, doc: str, *,
              spark_body: str | None = None,
              cte_where: dict[str, str] | None = None) -> None:
    """``spark_body`` (r13): an equivalent respelling executed Spark-side
    while the DuckDB oracle keeps running ``body`` verbatim (e.g. q67's
    two-phase rollup).  Every divergence between the two texts must carry a
    call-site equivalence argument and a rewritten==inline row pin in
    tests/test_plans.py; the oracle check enforces it on every run."""
    _BODIES[name] = body
    sbody = spark_body or body
    pruned_sql = _pruned_prelude(sbody, cte_where) + sbody

    def fn(spark, sf_dir, _sql=pruned_sql):
        _ensure_views(spark, sf_dir)
        return spark.sql(_sql.replace("__SF__", sf_dir))

    fn.__name__ = name
    fn.__doc__ = doc
    tags = ("tpcds", "exec", "bench") if name in _BENCH_TPCDS else ("tpcds", "exec")
    query(name, oracle=_DUCK_DERIVE + body, tags=tags)(fn)


def _register_shared_cte(name: str, body: str, doc: str, *,
                         cte: str, final_marker: str,
                         ref_prefix: str | tuple[str, ...],
                         mat_where: str | None = None,
                         cte_where: dict[str, str] | None = None) -> None:
    """Register a query whose final statement consumes one heavy CTE many
    times, materializing that CTE ONCE per invocation (r12, guide §3.3).

    Spark inlines WITH-CTEs, so ``year_total`` consumed six ways in q4 ran
    the three-channel fact aggregation six times (each copy pruned to one
    channel-year by pushdown).  The rewrite computes the CTE once — all
    channels, both years — writes it to a process-local temp parquet
    (customer-grain rows, far smaller than the facts it aggregates; at
    100 TB this spill-to-storage materialization is exactly what engines
    with CTE materialization do), and the final self-join reads that.
    Interleaved A/B at sf0.1: q4 2.85 s → 2.35 s.  Fresh directory per
    invocation — nothing persists across runs (the write is inside the
    timed region), and the plan stays a plain parquet scan so the
    unparser round-trip is preserved (a localCheckpoint would analyze to
    LogicalRDD, a refusal class).  Results identical; same oracle.
    """
    _BODIES[name] = body
    idx = body.index(final_marker)
    ctes_part, final_part = body[:idx], body[idx:]
    # ``mat_where`` (r13) prunes the materialization to rows the final
    # statement can consume, when the final statement's own predicates
    # imply it (e.g. q64 reads only syear 2000/2001 of cross_sales) — the
    # filter is on CTE OUTPUT columns, so equivalence is plain predicate
    # pushdown; the DuckDB oracle runs the inline text and the
    # rewritten==inline row pin in tests/test_plans.py enforces it.
    mat_sql = (_pruned_prelude(body, cte_where) + ctes_part
               + f" SELECT * FROM {cte}"
               + (f" WHERE {mat_where}" if mat_where else ""))
    view = f"{cte}_{name}"
    final_sql = final_part
    for rp in ((ref_prefix,) if isinstance(ref_prefix, str) else ref_prefix):
        final_sql = final_sql.replace(f"{cte} {rp}", f"{view} {rp}")
        assert f"{cte} {rp}" not in final_sql

    def fn(spark, sf_dir, _mat=mat_sql, _final=final_sql, _view=view):
        _ensure_views(spark, sf_dir)  # derive CTEs read the cached views
        dest = os.path.join(
            _MAT_TMP, f"{name}_{os.getpid()}_{next(_MAT_SEQ)}")
        spark.sql(_mat.replace("__SF__", sf_dir)).write.mode(
            "overwrite").parquet(dest)
        spark.read.parquet(dest).createOrReplaceTempView(_view)
        return spark.sql(_final.replace("__SF__", sf_dir))

    fn.__name__ = name
    fn.__doc__ = doc
    tags = ("tpcds", "exec", "bench") if name in _BENCH_TPCDS else ("tpcds", "exec")
    query(name, oracle=_DUCK_DERIVE + body, tags=tags)(fn)


# Every TPC-DS fact CTE (3 sales + 3 returns channels) is a projection +
# filter of the SAME base join — this pattern anchors the shared-fact
# materialization below; a derive edit that breaks it fails loudly at import.
_FACT_SRC_RE = re.compile(
    r"^(\w+) AS \(\s*SELECT\s+(.*?)\s*"
    r"FROM lineitem\s+JOIN orders ON l_orderkey = o_orderkey\s*"
    r"(?:WHERE\s+(.*?))?\s*\)$",
    re.DOTALL)


def _split_select_list(sel: str) -> list[str]:
    """Split a SELECT list on top-level commas (depth-aware; the derive's
    expressions contain commas only inside parens)."""
    out, depth, cur = [], 0, []
    for ch in sel:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return out


def _replace_body_cte(text: str, name: str, repl_body: str) -> str:
    """Replace the definition of CTE ``name`` in a WITH-list with
    ``repl_body`` (paren-depth aware; the CTE name appears as a definition
    exactly once by construction)."""
    start = text.index(f"{name} AS (")
    i = text.index("(", start)
    depth = 0
    for j in range(i, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[:start] + f"{name} AS ({repl_body})" + text[j + 1:]
    raise ValueError(f"unbalanced CTE definition for {name}")


def _register_shared_fact(name: str, body: str, doc: str, *,
                          facts: list[str],
                          mat_where: str | None = None,
                          fact_where: dict[str, str] | None = None,
                          mat_ctes: list[str] | None = None,
                          mat_final_marker: str | None = None) -> None:
    """Register a query whose body consumes several fact-channel CTEs,
    materializing their SHARED base join once per invocation (r12,
    guide §2.4/§3.3: do fewer passes — every channel is a projection of
    the one lineitem⋈orders join, so N textual fact references need ONE
    physical pass, not N).

    Mechanics: at registration, each fact CTE named in ``facts`` is parsed
    into its per-column expressions and channel predicate (they all match
    _FACT_SRC_RE by construction).  The invocation (a) executes ONE
    ``SELECT <base cols> FROM lineitem JOIN orders`` pass — base cols
    pruned to what the body-referenced channel columns actually derive
    from — into a fresh process-local temp parquet, then (b) runs the
    UNCHANGED body under a prelude in which each fact CTE is redefined to
    compute its original column expressions FROM that materialization
    (original channel WHERE kept verbatim).  The body text is
    byte-identical to the inline spelling, so results are identical as
    long as each redefined CTE produces the same rows — which it does by
    construction, column for column.

    ``mat_where`` / ``fact_where`` optionally push a date predicate that
    the BODY already implies into the shared scan / one channel's
    redefinition (e.g. every q14 fact reference joins date_dim on
    sold_date_sk with d_year constrained; sold_date_sk = f(o_orderdate)
    with f injective, so the o_orderdate window is exactly the rows that
    can survive).  Each caller documents its implication; the DuckDB
    oracle (which runs the original inline text) plus the
    rewritten==inline row pin in tests/test_plans.py enforce it.

    Fresh scratch dir per invocation — the materialization write happens
    inside the timed region and nothing persists across runs.
    """
    _BODIES[name] = body
    fact_where = fact_where or {}
    cte_map = dict(_CTES)
    parsed: dict[str, tuple[dict[str, str], str | None]] = {}
    for f in facts:
        m = _FACT_SRC_RE.match(cte_map[f])
        assert m, f"{name}: fact CTE {f} no longer matches the shared-join pattern"
        amap: dict[str, str] = {}
        for item in _split_select_list(m.group(2)):
            am = re.search(r"\bAS\s+(\w+)\s*$", item)
            assert am, f"{name}: unaliased column in {f}: {item!r}"
            amap[am.group(1)] = item[: am.start()].rstrip()
        parsed[f] = (amap, m.group(3))

    used_cols: dict[str, list[str]] = {}
    base_cols: set[str] = set()
    for f in facts:
        amap, pred = parsed[f]
        used = [a for a in amap if re.search(rf"\b{a}\b", body)]
        assert used, f"{name}: no column of {f} referenced by the body"
        used_cols[f] = used
        texts = [amap[a] for a in used]
        texts += [p for p in (pred, fact_where.get(f)) if p]
        for t in texts:
            base_cols.update(re.findall(r"\b[lo]_\w+\b", t))
    if mat_where:
        base_cols.update(re.findall(r"\b[lo]_\w+\b", mat_where))

    # The materialization only needs rows SOME consumer keeps: when every
    # fact carries a predicate, their disjunction prunes the shared write
    # (each channel re-applies its own conjunction on read, so a row that
    # satisfies no channel's predicate is dead weight).  Single-table
    # conjuncts (e.g. q95's shared l_suppkey % 4 = 1) additionally push
    # below the join and shrink the join itself.  Skipped when any fact is
    # unfiltered (the disjunction would be vacuously true).
    per_fact_conj = []
    for f in facts:
        preds = [p for p in (parsed[f][1], fact_where.get(f)) if p]
        per_fact_conj.append(" AND ".join(f"({p})" for p in preds)
                             if preds else None)
    mat_preds = [p for p in (mat_where,) if p]
    if all(per_fact_conj):
        mat_preds.append("(" + " OR ".join(f"({c})" for c in per_fact_conj)
                         + ")")
    mat_sql = ("SELECT " + ", ".join(sorted(base_cols))
               + "\nFROM lineitem JOIN orders ON l_orderkey = o_orderkey"
               + ("\nWHERE " + " AND ".join(mat_preds) if mat_preds else ""))
    matview = f"shared_fact_{name}"
    redefs: dict[str, str] = {}
    for f in facts:
        amap, pred = parsed[f]
        sel = ",\n         ".join(f"{amap[a]} AS {a}" for a in used_cols[f])
        preds = [p for p in (pred, fact_where.get(f)) if p]
        w = ("\n  WHERE " + " AND ".join(f"({p})" for p in preds)) if preds else ""
        redefs[f] = f"{f} AS (\n  SELECT {sel}\n  FROM {matview}{w}\n)"
    kept = _kept_ctes(body)
    kept_names = {n for n, _ in kept}
    assert all(f in kept_names for f in facts), f"{name}: fact not in closure"
    prelude = "\nWITH " + ",\n".join(
        redefs.get(n, text) for n, text in kept) + "\n"
    final_sql = prelude + body

    # Optional second-level materialization (§3.3, the year_total trick
    # applied inside a shared-fact query): each named body CTE is computed
    # ONCE per invocation into its own scratch parquet and its definition
    # replaced by a scan, instead of being re-inlined at every reference
    # (q14's cross_items is consumed by all three channel legs — inline,
    # Spark derives the 3-channel INTERSECT three times).  Results
    # identical by construction; rows pinned in test_plans.py.
    cte_mats: list[tuple[str, str]] = []  # (view_name, mat_sql)
    if mat_ctes:
        assert mat_final_marker and mat_final_marker in final_sql
        idx = final_sql.index(mat_final_marker)
        ctes_part, final_stmt = final_sql[:idx], final_sql[idx:]
        for cte in mat_ctes:
            cte_view = f"{cte}_m_{name}"
            cte_mats.append((cte_view, ctes_part + f" SELECT * FROM {cte}"))
            ctes_part = _replace_body_cte(ctes_part, cte,
                                          f"SELECT * FROM {cte_view}")
        final_sql = ctes_part + final_stmt

    def fn(spark, sf_dir, _mat=mat_sql, _final=final_sql, _view=matview,
           _cte_mats=tuple(cte_mats)):
        _ensure_views(spark, sf_dir)  # lineitem/orders session views
        dest = os.path.join(
            _MAT_TMP, f"{name}_{os.getpid()}_{next(_MAT_SEQ)}")
        spark.sql(_mat).write.mode("overwrite").parquet(dest)
        spark.read.parquet(dest).createOrReplaceTempView(_view)
        for i, (cv, cm) in enumerate(_cte_mats):
            cdest = f"{dest}_c{i}"
            spark.sql(cm.replace("__SF__", sf_dir)).write.mode(
                "overwrite").parquet(cdest)
            spark.read.parquet(cdest).createOrReplaceTempView(cv)
        return spark.sql(_final.replace("__SF__", sf_dir))

    fn.__name__ = name
    fn.__doc__ = doc
    tags = ("tpcds", "exec", "bench") if name in _BENCH_TPCDS else ("tpcds", "exec")
    query(name, oracle=_DUCK_DERIVE + body, tags=tags)(fn)


_register(
    "tpcds_q3",
    """
    SELECT dt.d_year,
           item.i_brand_id AS brand_id,
           item.i_brand AS brand,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_agg
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manufact_id = 436
      AND dt.d_moy = 12
    GROUP BY dt.d_year, item.i_brand, item.i_brand_id
    ORDER BY dt.d_year, sum_agg DESC, brand_id
    LIMIT 100
    """,
    doc="""TPC-DS q3 (reference tpcds_sql/3.sql) executed on the derived
    star schema: December brand revenue by year for one manufacturer.
    Verbatim join graph/grouping/ordering; sum CAST to DOUBLE per house
    rule.""",
)

_register(
    "tpcds_q42",
    """
    SELECT dt.d_year,
           item.i_category_id,
           item.i_category,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_sales
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manager_id = 1
      AND dt.d_moy = 12
      AND dt.d_year = 1998
    GROUP BY dt.d_year, item.i_category_id, item.i_category
    ORDER BY sum_sales DESC, dt.d_year, item.i_category_id, item.i_category
    LIMIT 100
    """,
    doc="""TPC-DS q42 (reference tpcds_sql/42.sql) executed: December 1998
    category revenue for manager 1.  The bare ORDER BY sum() is aliased
    (sum_sales) so both engines hash the same column name.""",
)

_register(
    "tpcds_q52",
    """
    SELECT dt.d_year,
           item.i_brand_id AS brand_id,
           item.i_brand AS brand,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS ext_price
    FROM date_dim dt, store_sales, item
    WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
      AND store_sales.ss_item_sk = item.i_item_sk
      AND item.i_manager_id = 1
      AND dt.d_moy = 12
      AND dt.d_year = 1998
    GROUP BY dt.d_year, item.i_brand, item.i_brand_id
    ORDER BY dt.d_year, ext_price DESC, brand_id
    LIMIT 100
    """,
    doc="""TPC-DS q52 (reference tpcds_sql/52.sql) executed: December 1998
    brand revenue for manager 1, ext_price-descending.""",
)

_register(
    "tpcds_q55",
    """
    SELECT item.i_brand_id AS brand_id,
           item.i_brand AS brand,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS ext_price
    FROM date_dim, store_sales, item
    WHERE d_date_sk = ss_sold_date_sk
      AND ss_item_sk = i_item_sk
      AND i_manager_id = 36
      AND d_moy = 12
      AND d_year = 2000
    GROUP BY i_brand, i_brand_id
    ORDER BY ext_price DESC, i_brand_id
    LIMIT 100
    """,
    doc="""TPC-DS q55 (reference tpcds_sql/55.sql) executed: December
    brand revenue for manager 36.  d_year 2001 → 2000 (the synthetic
    calendar ends 2001-08; December 2001 is empty by construction).""",
)

_register(
    "tpcds_q98",
    """
    SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
           CAST(rev AS DOUBLE) AS itemrevenue,
           CAST(rev AS DOUBLE) * 100.0
               / CAST(SUM(rev) OVER (PARTITION BY i_class) AS DOUBLE)
               AS revenueratio
    FROM (
      SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
             SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS rev
      FROM store_sales, item, date_dim
      WHERE ss_item_sk = i_item_sk
        AND i_category IN ('ECONOMY', 'PROMO', 'STANDARD')
        AND ss_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('2001-01-12' AS DATE)
                       AND CAST('2001-01-12' AS DATE) + INTERVAL 30 DAY
      GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
    ) t
    ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
    
""",
    doc="""TPC-DS q98 (reference tpcds_sql/98.sql) executed: the
    item-revenue share-of-class report over the store channel, with
    the sum(x)*100/sum(sum(x)) OVER (PARTITION BY i_class) window over
    the grouped star join.  Adaptations documented in the module
    docstring: the window-over-aggregate is restructured as an inner
    aggregate + outer window so the class total accumulates in
    DECIMAL(38,6) (a DOUBLE window total would be order-dependent), the
    ratio divides the two exact decimals as doubles (IEEE-identical),
    and the category IN-list targets three synthetic p_type values.""",
)

_register(
    "tpcds_q12",
    """
    SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
           CAST(rev AS DOUBLE) AS itemrevenue,
           CAST(rev AS DOUBLE) * 100.0
               / CAST(SUM(rev) OVER (PARTITION BY i_class) AS DOUBLE)
               AS revenueratio
    FROM (
      SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
             SUM(CAST(ws_ext_sales_price AS DECIMAL(38,6))) AS rev
      FROM web_sales, item, date_dim
      WHERE ws_item_sk = i_item_sk
        AND i_category IN ('ECONOMY', 'PROMO', 'STANDARD')
        AND ws_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('2001-01-12' AS DATE)
                       AND CAST('2001-01-12' AS DATE) + INTERVAL 30 DAY
      GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
    ) t
    ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
    LIMIT 100
""",
    doc="""TPC-DS q12 (reference tpcds_sql/12.sql) executed: the
    item-revenue share-of-class report over the web channel, with
    the sum(x)*100/sum(sum(x)) OVER (PARTITION BY i_class) window over
    the grouped star join.  Adaptations documented in the module
    docstring: the window-over-aggregate is restructured as an inner
    aggregate + outer window so the class total accumulates in
    DECIMAL(38,6) (a DOUBLE window total would be order-dependent), the
    ratio divides the two exact decimals as doubles (IEEE-identical),
    and the category IN-list targets three synthetic p_type values.""",
)

_register(
    "tpcds_q20",
    """
    SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
           CAST(rev AS DOUBLE) AS itemrevenue,
           CAST(rev AS DOUBLE) * 100.0
               / CAST(SUM(rev) OVER (PARTITION BY i_class) AS DOUBLE)
               AS revenueratio
    FROM (
      SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
             SUM(CAST(cs_ext_sales_price AS DECIMAL(38,6))) AS rev
      FROM catalog_sales, item, date_dim
      WHERE cs_item_sk = i_item_sk
        AND i_category IN ('ECONOMY', 'PROMO', 'STANDARD')
        AND cs_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('2001-01-12' AS DATE)
                       AND CAST('2001-01-12' AS DATE) + INTERVAL 30 DAY
      GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
    ) t
    ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
    LIMIT 100
""",
    doc="""TPC-DS q20 (reference tpcds_sql/20.sql) executed: the
    item-revenue share-of-class report over the catalog channel, with
    the sum(x)*100/sum(sum(x)) OVER (PARTITION BY i_class) window over
    the grouped star join.  Adaptations documented in the module
    docstring: the window-over-aggregate is restructured as an inner
    aggregate + outer window so the class total accumulates in
    DECIMAL(38,6) (a DOUBLE window total would be order-dependent), the
    ratio divides the two exact decimals as doubles (IEEE-identical),
    and the category IN-list targets three synthetic p_type values.""",
)

_register(
    "tpcds_q96",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM store_sales, household_demographics, time_dim, store
    WHERE ss_sold_time_sk = time_dim.t_time_sk
      AND ss_hdemo_sk = household_demographics.hd_demo_sk
      AND ss_store_sk = s_store_sk
      AND time_dim.t_hour = 8
      AND time_dim.t_minute >= 30
      AND household_demographics.hd_dep_count = 5
      AND store.s_store_name = 'store_3'
    ORDER BY cnt
    LIMIT 100
    """,
    doc="""TPC-DS q96 (reference tpcds_sql/96.sql) executed: the
    4-dimension counting star (time-of-day slice × household dependents
    × one store).  time_dim (86 400 seconds), household_demographics
    (7 200 profiles) and store (10 stores) are generated dimensions —
    pure functions of their surrogate key, identical in both engines;
    the fact carries deterministic ss_sold_time_sk / ss_hdemo_sk /
    ss_store_sk derivations.  s_store_name constant retargeted
    'ese' → 'store_3' (synthetic store names); count aliased cnt.""",
)

_AVG = "CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({c})"

_register(
    "tpcds_q7",
    f"""
    SELECT i_item_id,
           {_AVG.format(c='ss_quantity')}    AS agg1,
           {_AVG.format(c='ss_list_price')}  AS agg2,
           {_AVG.format(c='ss_coupon_amt')}  AS agg3,
           {_AVG.format(c='ss_sales_price')} AS agg4
    FROM store_sales, customer_demographics, date_dim, item, promotion
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_cdemo_sk = cd_demo_sk
      AND ss_promo_sk = p_promo_sk
      AND cd_gender = 'F'
      AND cd_marital_status = 'W'
      AND cd_education_status = 'Primary'
      AND (p_channel_email = 'N' OR p_channel_event = 'N')
      AND d_year = 1998
    GROUP BY i_item_id
    ORDER BY i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q7 (reference tpcds_sql/7.sql) executed: demographic ×
    promotion item averages over the 5-relation star.
    customer_demographics (gender/marital/education as key functions)
    and promotion (channel flags) are generated dimensions; the fact
    carries ss_cdemo_sk/ss_promo_sk plus the quantity/price/coupon
    measures.  Each avg() is spelled as exact-decimal-sum / count (house
    determinism rule — a native double avg is accumulation-order-
    dependent); join graph, filters, grouping and LIMIT verbatim.""",
)


_register(
    "tpcds_q26",
    f"""
    SELECT i_item_id,
           {_AVG.format(c='cs_quantity')}    AS agg1,
           {_AVG.format(c='cs_list_price')}  AS agg2,
           {_AVG.format(c='cs_coupon_amt')}  AS agg3,
           {_AVG.format(c='cs_sales_price')} AS agg4
    FROM catalog_sales, customer_demographics, date_dim, item, promotion
    WHERE cs_sold_date_sk = d_date_sk
      AND cs_item_sk = i_item_sk
      AND cs_bill_cdemo_sk = cd_demo_sk
      AND cs_promo_sk = p_promo_sk
      AND cd_gender = 'F'
      AND cd_marital_status = 'W'
      AND cd_education_status = 'Primary'
      AND (p_channel_email = 'N' OR p_channel_event = 'N')
      AND d_year = 1998
    GROUP BY i_item_id
    ORDER BY i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q26 (reference tpcds_sql/26.sql) executed: the catalog-
    channel twin of q7 over the same generated customer_demographics and
    promotion dimensions, with the cs_bill_cdemo_sk/cs_promo_sk and
    measure derivations on the catalog channel subset.  Same avg-as-
    exact-sum/count spelling as q7; text otherwise verbatim.""",
)


_register(
    "tpcds_q34",
    """
    SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
           ss_ticket_number, cnt
    FROM (
      SELECT ss_ticket_number, ss_customer_sk,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3
             OR date_dim.d_dom BETWEEN 25 AND 28)
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = '5001-10000')
        AND household_demographics.hd_vehicle_count > 0
        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
                  THEN household_demographics.hd_dep_count
                       / household_demographics.hd_vehicle_count
                  ELSE NULL END) > 1.2
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('Daviess County', 'Franklin Parish',
                               'Barrow County', 'Luce County',
                               'Fairfield County', 'Richland County',
                               'Ziebach County', 'Walker County')
      GROUP BY ss_ticket_number, ss_customer_sk
    ) dn, customer
    WHERE ss_customer_sk = c_customer_sk
      AND cnt BETWEEN 2 AND 4
    ORDER BY c_last_name, c_first_name, c_salutation,
             c_preferred_cust_flag DESC, ss_ticket_number
    """,
    doc="""TPC-DS q34 (reference tpcds_sql/34.sql) executed: ticket-level
    basket counts under month-boundary / buy-potential / vehicle-ratio
    slices, rejoined to customer.  The county IN-list constants are kept
    VERBATIM — the derived store dimension places 8 of its 10 stores in
    exactly those counties; hd_buy_potential keeps the reference's value
    domain.  One documented retarget: cnt BETWEEN 15 AND 20 → 2 AND 4
    (a synthetic order has at most ~7 line items, so the original band
    is empty by construction).  The int/int vehicle-ratio division is
    DOUBLE in both engines.""",
)


_register(
    "tpcds_q65",
    """
    SELECT s_store_name, i_item_desc,
           CAST(sc.revenue AS DOUBLE) AS revenue,
           i_current_price, i_wholesale_cost, i_brand
    FROM store, item,
         (SELECT ss_store_sk,
                 CAST(SUM(revenue) AS DOUBLE) / COUNT(revenue) AS ave
          FROM (SELECT ss_store_sk, ss_item_sk,
                       SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS revenue
                FROM store_sales, date_dim
                WHERE ss_sold_date_sk = d_date_sk
                  AND d_month_seq BETWEEN 1272 AND 1272 + 11
                GROUP BY ss_store_sk, ss_item_sk) sa
          GROUP BY ss_store_sk) sb,
         (SELECT ss_store_sk, ss_item_sk,
                 SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS revenue
          FROM store_sales, date_dim
          WHERE ss_sold_date_sk = d_date_sk
            AND d_month_seq BETWEEN 1272 AND 1272 + 11
          GROUP BY ss_store_sk, ss_item_sk) sc
    WHERE sb.ss_store_sk = sc.ss_store_sk
      AND CAST(sc.revenue AS DOUBLE) <= 0.1 * sb.ave
      AND s_store_sk = sc.ss_store_sk
      AND i_item_sk = sc.ss_item_sk
    ORDER BY s_store_name, i_item_desc
    LIMIT 100
    """,
    doc="""TPC-DS q65 (reference tpcds_sql/65.sql) executed: per-(store,
    item) revenue against 10% of the store's average item revenue — the
    double-aggregation + threshold-rejoin shape.  d_month_seq derives as
    1200 + months-since-1992 (the constant retargets 1212 → 1272 = the
    12 months of 1998, inside the synthetic calendar); revenues
    accumulate in DECIMAL(38,6) and the average is spelled exact-sum /
    count, so the <= threshold compares IEEE-identical doubles on both
    engines.  i_wholesale_cost derives as p_retailprice * 0.6
    (deterministic double product).""",
)

_register(
    "tpcds_q73",
    """
    SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
           ss_ticket_number, cnt
    FROM (
      SELECT ss_ticket_number, ss_customer_sk,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = '5001-10000')
        AND household_demographics.hd_vehicle_count > 0
        AND CASE WHEN household_demographics.hd_vehicle_count > 0
                 THEN household_demographics.hd_dep_count
                      / household_demographics.hd_vehicle_count
                 ELSE NULL END > 1
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('Daviess County', 'Franklin Parish',
                               'Barrow County', 'Luce County')
      GROUP BY ss_ticket_number, ss_customer_sk
    ) dj, customer
    WHERE ss_customer_sk = c_customer_sk
      AND cnt BETWEEN 1 AND 5
    ORDER BY cnt DESC, c_last_name ASC
    """,
    doc="""TPC-DS q73 (reference tpcds_sql/73.sql) executed VERBATIM —
    every constant (d_dom 1-2, the two buy-potential bands, vehicle
    ratio > 1, the 4-county list, cnt 1-5) is satisfiable under the
    derived dimensions, so unlike q34 no retarget is needed; the only
    adaptation is CAST(COUNT(*) AS BIGINT) aliasing.  Order-insensitive
    hash makes the non-unique ORDER BY safe.""",
)


_register(
    "tpcds_q88",
    """
    SELECT *
    FROM
    (SELECT CAST(COUNT(*) AS BIGINT) AS h8_30_to_9
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 8 AND time_dim.t_minute >= 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s1,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h9_to_9_30
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 9 AND time_dim.t_minute < 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s2,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h9_30_to_10
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 9 AND time_dim.t_minute >= 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s3,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h10_to_10_30
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 10 AND time_dim.t_minute < 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s4,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h10_30_to_11
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 10 AND time_dim.t_minute >= 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s5,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h11_to_11_30
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 11 AND time_dim.t_minute < 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s6,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h11_30_to_12
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 11 AND time_dim.t_minute >= 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s7,
    (SELECT CAST(COUNT(*) AS BIGINT) AS h12_to_12_30
     FROM store_sales, household_demographics, time_dim, store
     WHERE ss_sold_time_sk = time_dim.t_time_sk
       AND ss_hdemo_sk = household_demographics.hd_demo_sk
       AND ss_store_sk = s_store_sk
       AND time_dim.t_hour = 12 AND time_dim.t_minute < 30
       AND ((household_demographics.hd_dep_count = 3 AND household_demographics.hd_vehicle_count <= 3+2) OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0+2) OR (household_demographics.hd_dep_count = 1 AND household_demographics.hd_vehicle_count <= 1+2))
       AND store.s_store_name = 'store_3') s8
    """,
    doc="""TPC-DS q88 (reference tpcds_sql/88.sql) executed: eight
    half-hour time-slice counting stars (8:30-12:30) over the generated
    time_dim/household_demographics/store dimensions, cross-joined into
    a single row — the multi-subquery scan-reuse shape.  The
    dep-count/vehicle-count OR-of-ANDs predicate is verbatim
    (satisfiable under hd_dep_count = sk%10, hd_vehicle_count = sk%5);
    s_store_name retargets 'ese' -> 'store_3' as in q96; counts are
    BIGINT-aliased.  At scale each subquery is the same broadcast-dims
    star; Spark evaluates the eight scans in one stage wave and the
    cross join of eight 1-row relations is free.""",
)


_register(
    "tpcds_q19",
    """
    SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id,
           i_manufact,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS ext_price
    FROM date_dim, store_sales, item, customer, customer_address, store
    WHERE d_date_sk = ss_sold_date_sk
      AND ss_item_sk = i_item_sk
      AND i_manager_id = 7
      AND d_moy = 11
      AND d_year = 1999
      AND ss_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
      AND ss_store_sk = s_store_sk
    GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
    ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
    LIMIT 100
    """,
    doc="""TPC-DS q19 (reference tpcds_sql/19.sql) executed VERBATIM (only
    the decimal-sum CAST adaptation): November brand revenue restricted
    to customers shopping OUTSIDE their own zip prefix — the
    cross-dimension negation predicate (substr(ca_zip) <> substr(s_zip))
    that can only be evaluated after both geography dims join in.
    customer_address derives as a key-functional zip per customer and
    store gains a deterministic s_zip; all six relations and the filter
    constants (i_manager_id=7, 1999-11) are the reference's own.""",
)


_register(
    "tpcds_q79",
    """
    SELECT c_last_name, c_first_name,
           substr(s_city, 1, 30) AS s_city30, ss_ticket_number, amt, profit
    FROM (
      SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             CAST(SUM(CAST(ss_coupon_amt AS DECIMAL(38,6))) AS DOUBLE)
                 AS amt,
             CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
                 AS profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 8
             OR household_demographics.hd_vehicle_count > 0)
        AND date_dim.d_dow = 1
        AND date_dim.d_year IN (1998, 1998 + 1, 1998 + 2)
        AND store.s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city
    ) ms, customer
    WHERE ss_customer_sk = c_customer_sk
    ORDER BY c_last_name, c_first_name, substr(s_city, 1, 30), profit,
             ss_ticket_number
    LIMIT 100
    """,
    doc="""TPC-DS q79 (reference tpcds_sql/79.sql) executed: Monday
    ticket-level coupon/profit per customer for mid-size stores.  d_dow
    derives ARITHMETICALLY ((days-since-1992-01-01 + 3) % 7, Sunday=0 —
    builtin dayofweek conventions differ between engines, pure modular
    arithmetic does not); s_number_employees = 150 + 15·sk puts stores
    4-9 in the 200-295 band; every filter constant is verbatim.  Money
    sums decimal-accumulate per house rule, and ss_ticket_number joins
    the ORDER BY as a uniqueness tiebreak for the LIMIT (the reference
    order is non-unique across tickets).""",
)

_register(
    "tpcds_q68",
    """
    SELECT c_last_name, c_first_name, ca_city, bought_city,
           ss_ticket_number, extended_price, extended_tax, list_price
    FROM (
      SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
                 AS extended_price,
             CAST(SUM(CAST(ss_ext_list_price AS DECIMAL(38,6))) AS DOUBLE)
                 AS list_price,
             CAST(SUM(CAST(ss_ext_tax AS DECIMAL(38,6))) AS DOUBLE)
                 AS extended_tax
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_dep_count = 6
             OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_city IN ('Oakland', 'Riverside')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city
    ) dn, customer, customer_address current_addr
    WHERE ss_customer_sk = c_customer_sk
      AND customer.c_current_addr_sk = current_addr.ca_address_sk
      AND current_addr.ca_city <> bought_city
    ORDER BY c_last_name, ss_ticket_number
    LIMIT 100
    """,
    doc="""TPC-DS q68 (reference tpcds_sql/68.sql) executed: month-start
    ticket totals where the purchase address city differs from the
    customer's CURRENT address city — customer_address joins twice under
    different roles.  ss_addr_sk derives as o_custkey + l_linenumber%2,
    so a ticket's purchase address usually differs from the current one
    and the <> predicate is selective; the city IN-list is verbatim
    against the derived s_city domain.  Money sums decimal-accumulate;
    (c_last_name, ss_ticket_number) is unique under the derivations so
    the LIMIT is deterministic.""",
)


_register(
    "tpcds_q15",
    """
    SELECT ca_zip,
           CAST(SUM(CAST(cs_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_sales
    FROM catalog_sales, customer, customer_address, date_dim
    WHERE cs_bill_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
                                    '86475', '85392', '85460', '80348',
                                    '81792')
           OR ca_state IN ('CA', 'WA', 'GA')
           OR cs_sales_price > 500)
      AND cs_sold_date_sk = d_date_sk
      AND d_qoy = 2 AND d_year = 2000
    GROUP BY ca_zip
    ORDER BY ca_zip
    LIMIT 100
    """,
    doc="""TPC-DS q15 (reference tpcds_sql/15.sql) executed VERBATIM (only
    the decimal-sum CAST): Q2-2000 catalog revenue by customer zip under
    the three-branch OR (zip prefix list / state list / high-ticket).
    The state branch is the live one under the derivations (ca_state =
    key-functional 7-state domain including CA/WA/GA); the reference's
    zip literals and the >500 price branch evaluate but select nothing
    on the synthetic domains — the OR short-circuit semantics are still
    exercised on every row.  d_qoy derives as (d_moy-1)/3+1.""",
)


_register(
    "tpcds_q45",
    """
    SELECT ca_zip, ca_county,
           CAST(SUM(CAST(ws_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_sales
    FROM web_sales, customer, customer_address, date_dim, item
    WHERE ws_bill_customer_sk = c_customer_sk
      AND c_current_addr_sk = ca_address_sk
      AND ws_item_sk = i_item_sk
      AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
                                    '86475', '85392', '85460', '80348',
                                    '81792')
           OR i_item_id IN (SELECT i_item_id
                            FROM item
                            WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17,
                                                19, 23, 29)))
      AND ws_sold_date_sk = d_date_sk
      AND d_qoy = 2 AND d_year = 2000
    GROUP BY ca_zip, ca_county
    ORDER BY ca_zip, ca_county
    LIMIT 100
    """,
    doc="""TPC-DS q45 (reference tpcds_sql/45.sql) executed VERBATIM (only
    the decimal-sum CAST): Q2-2000 web revenue by customer zip/county
    where the OR's live branch is an uncorrelated item-id IN-subquery
    over the ten prime item keys — which exist as p_partkey values at
    every scale factor, so the reference's own constants select real
    rows; the zip-literal branch evaluates but is empty on the derived
    zip domain (as in q15).  ca_county derives key-functionally.""",
)


def _q56_channel(alias: str, table: str, p: str, addr: str) -> str:
    return f"""
    {alias} AS (
      SELECT i_item_id,
             SUM(CAST({p}_ext_sales_price AS DECIMAL(38,6))) AS total_sales
      FROM {table}, date_dim, customer_address, item
      WHERE i_item_id IN (SELECT i_item_id FROM item
                          WHERE i_color IN ('orchid', 'chiffon', 'lace'))
        AND {p}_item_sk = i_item_sk
        AND {p}_sold_date_sk = d_date_sk
        AND d_year = 2000
        AND d_moy = 1
        AND {addr} = ca_address_sk
        AND ca_gmt_offset = -8
      GROUP BY i_item_id)"""


_register(
    "tpcds_q56",
    ","
    + _q56_channel("ss2", "store_sales", "ss", "ss_addr_sk")
    + ","
    + _q56_channel("cs2", "catalog_sales", "cs", "cs_bill_addr_sk")
    + ","
    + _q56_channel("ws2", "web_sales", "ws", "ws_bill_addr_sk")
    + """
    SELECT i_item_id,
           CAST(SUM(total_sales) AS DOUBLE) AS total_sales
    FROM (SELECT * FROM ss2
          UNION ALL SELECT * FROM cs2
          UNION ALL SELECT * FROM ws2) tmp1
    GROUP BY i_item_id
    ORDER BY total_sales, i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q56 (reference tpcds_sql/56.sql) executed: the
    three-channel UNION ALL aggregation — per-channel (item, color-list
    IN-subquery, January-2000, GMT-8 address) stars summed per item and
    re-aggregated across channels.  Every filter constant is VERBATIM:
    the derived i_color domain contains orchid/chiffon/lace, ca_gmt_offset
    = -8 + key%3 makes a third of addresses GMT-8, and the channel facts
    carry their own bill-address keys.  Both aggregation levels
    accumulate in DECIMAL(38,6) (the inner channel totals stay decimal
    through the UNION so the outer sum is exact); only the final cast is
    DOUBLE.  The channel CTEs ride the shared WITH list (leading-comma
    continuation), so Spark and DuckDB parse the same shape.""",
)


def _tri_channel(alias: str, table: str, p: str, addr: str, key: str,
                 subq: str, year: int, moy: int, gmt: int) -> str:
    """One channel CTE of the q33/q56/q60 family: star over (fact,
    date_dim, customer_address, item) filtered by an item subquery,
    month and GMT band, aggregated per ``key`` in exact DECIMAL."""
    return f"""
    {alias} AS (
      SELECT {key},
             SUM(CAST({p}_ext_sales_price AS DECIMAL(38,6))) AS total_sales
      FROM {table}, date_dim, customer_address, item
      WHERE {key} IN ({subq})
        AND {p}_item_sk = i_item_sk
        AND {p}_sold_date_sk = d_date_sk
        AND d_year = {year}
        AND d_moy = {moy}
        AND {addr} = ca_address_sk
        AND ca_gmt_offset = {gmt}
      GROUP BY {key})"""


def _tri_body(key: str, subq: str, year: int, moy: int, gmt: int,
              order_tail: str) -> str:
    chans = [
        _tri_channel("ss2", "store_sales", "ss", "ss_addr_sk",
                     key, subq, year, moy, gmt),
        _tri_channel("cs2", "catalog_sales", "cs", "cs_bill_addr_sk",
                     key, subq, year, moy, gmt),
        _tri_channel("ws2", "web_sales", "ws", "ws_bill_addr_sk",
                     key, subq, year, moy, gmt),
    ]
    return ("," + ",".join(chans) + f"""
    SELECT {key},
           CAST(SUM(total_sales) AS DOUBLE) AS total_sales
    FROM (SELECT * FROM ss2
          UNION ALL SELECT * FROM cs2
          UNION ALL SELECT * FROM ws2) tmp1
    GROUP BY {key}
    ORDER BY total_sales{order_tail}
    LIMIT 100
    """)


_register(
    "tpcds_q60",
    _tri_body(
        "i_item_id",
        "SELECT i_item_id FROM item WHERE i_category IN ('PROMO')",
        1999, 9, -6, ", i_item_id",
    ),
    doc="""TPC-DS q60 (reference tpcds_sql/60.sql) executed: the q56
    shape keyed by item with an i_category subquery, September-1999,
    GMT-6.  One retarget: 'Children' → 'PROMO' (the derived i_category
    domain is the synthetic p_type vocabulary); ca_gmt_offset = -6 is
    the reference's own constant and lives in the derived -8..-6 band.
    i_item_id keeps its ORDER BY tiebreak from the reference text.""",
)

_register(
    "tpcds_q33",
    _tri_body(
        "i_manufact_id",
        "SELECT i_manufact_id FROM item WHERE i_category IN ('SMALL')",
        1999, 3, -6, ", i_manufact_id",
    ),
    doc="""TPC-DS q33 (reference tpcds_sql/33.sql) executed: the q56
    shape keyed by MANUFACTURER with an i_category-driven manufact-id
    subquery, March-1999, GMT-6 (verbatim).  Retargets: 'Books' →
    'SMALL' (synthetic category vocabulary) and i_manufact_id appended
    to the bare ORDER BY total_sales as a uniqueness tiebreak (the
    reference order is tie-ambiguous under LIMIT).""",
)


_register(
    "tpcds_q71",
    """
    SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
           CAST(SUM(CAST(ext_price AS DECIMAL(38,6))) AS DOUBLE)
               AS ext_price
    FROM item,
         (SELECT ws_ext_sales_price AS ext_price,
                 ws_sold_date_sk AS sold_date_sk,
                 ws_item_sk AS sold_item_sk,
                 ws_sold_time_sk AS time_sk
          FROM web_sales, date_dim
          WHERE d_date_sk = ws_sold_date_sk AND d_moy = 12 AND d_year = 2000
          UNION ALL
          SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk,
                 cs_sold_time_sk
          FROM catalog_sales, date_dim
          WHERE d_date_sk = cs_sold_date_sk AND d_moy = 12 AND d_year = 2000
          UNION ALL
          SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk,
                 ss_sold_time_sk
          FROM store_sales, date_dim
          WHERE d_date_sk = ss_sold_date_sk AND d_moy = 12 AND d_year = 2000
         ) tmp, time_dim
    WHERE sold_item_sk = i_item_sk
      AND i_manager_id = 1
      AND time_sk = t_time_sk
      AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
    GROUP BY i_brand, i_brand_id, t_hour, t_minute
    ORDER BY ext_price DESC, i_brand_id
    """,
    doc="""TPC-DS q71 (reference tpcds_sql/71.sql) executed: December-2000
    brand revenue by minute-of-day across the three channels UNIONed
    BEFORE the item/time joins (the opposite composition order to
    q56/q60/q33).  t_meal_time derives deterministically on the
    generated time_dim (breakfast 06:00-09:00, dinner 17:00-20:00);
    ws/cs facts gain sold_time_sk with the same arithmetic as the store
    channel.  i_manager_id = 1 and all date constants verbatim; the
    bare ORDER BY is safe under the order-insensitive hash (no
    LIMIT).""",
)


_register(
    "tpcds_q1",
    """
    , customer_total_return AS (
      SELECT sr_customer_sk AS ctr_customer_sk,
             sr_store_sk AS ctr_store_sk,
             CAST(SUM(CAST(sr_fee AS DECIMAL(38,6))) AS DOUBLE)
                 AS ctr_total_return
      FROM store_returns, date_dim
      WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
      GROUP BY sr_customer_sk, sr_store_sk
    )
    SELECT c_customer_id
    FROM customer_total_return ctr1, store, customer
    WHERE ctr1.ctr_total_return >
          (SELECT AVG(ctr_total_return) * 1.2
           FROM customer_total_return ctr2
           WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
      AND s_store_sk = ctr1.ctr_store_sk
      AND s_state = 'SD'
      AND ctr1.ctr_customer_sk = c_customer_sk
    ORDER BY c_customer_id
    LIMIT 100
    """,
    doc="""TPC-DS q1 (reference tpcds_sql/1.sql) executed: customers whose
    year-2000 return fees at one state's stores exceed 1.2x the
    per-store average (correlated CTE self-comparison).  store_returns
    derives from the 'R'-flagged lineitem rows with a deterministic
    0-89-day return lag; s_state = 'SD' is verbatim (the derived store
    state domain includes SD).  Per-customer totals accumulate in
    DECIMAL then compare as DOUBLE (house determinism rule); join
    graph, grouping, ordering and LIMIT verbatim.""",
)

_register(
    "tpcds_q6",
    """
    SELECT a.ca_state AS state, COUNT(*) AS cnt
    FROM customer_address a, customer c, store_sales s, date_dim d, item i
    WHERE a.ca_address_sk = c.c_current_addr_sk
      AND c.c_customer_sk = s.ss_customer_sk
      AND s.ss_sold_date_sk = d.d_date_sk
      AND s.ss_item_sk = i.i_item_sk
      AND d.d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
                           WHERE d_year = 2000 AND d_moy = 2)
      AND i.i_current_price > 1.02 *
          (SELECT AVG(j.i_current_price) FROM item j
           WHERE j.i_category = i.i_category)
    GROUP BY a.ca_state
    HAVING COUNT(*) >= 10
    ORDER BY cnt, state
    LIMIT 100
    """,
    doc="""TPC-DS q6 (reference tpcds_sql/6.sql) executed: states whose
    customers bought >=10 items priced above their category average in
    one month, with the uncorrelated scalar month-seq subquery and the
    category-correlated average-price subquery both verbatim.  One
    retarget: the 1.2x premium factor -> 1.02x (the synthetic
    p_retailprice domain is 900..1000, so 1.2x the mean exceeds the
    maximum and selects nothing by construction).""",
)

_register(
    "tpcds_q13",
    """
    SELECT CAST(SUM(CAST(ss_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(ss_quantity)            AS avg_qty,
           CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(ss_ext_sales_price)     AS avg_ext_price,
           CAST(SUM(CAST(ss_ext_wholesale_cost AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(ss_ext_wholesale_cost)  AS avg_wholesale,
           CAST(SUM(CAST(ss_ext_wholesale_cost AS DECIMAL(38,6))) AS DOUBLE)
                                               AS sum_wholesale
    FROM store_sales, store, customer_demographics,
         household_demographics, customer_address, date_dim
    WHERE s_store_sk = ss_store_sk
      AND ss_sold_date_sk = d_date_sk AND d_year = 2001
      AND ((ss_hdemo_sk = hd_demo_sk
            AND cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'D'
            AND cd_education_status = '2 yr Degree'
            AND ss_sales_price BETWEEN 0.05 AND 0.08
            AND hd_dep_count = 3)
        OR (ss_hdemo_sk = hd_demo_sk
            AND cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'S'
            AND cd_education_status = 'Secondary'
            AND ss_sales_price BETWEEN 0.01 AND 0.04
            AND hd_dep_count = 1)
        OR (ss_hdemo_sk = hd_demo_sk
            AND cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'W'
            AND cd_education_status = 'Advanced Degree'
            AND ss_sales_price BETWEEN 0.03 AND 0.06
            AND hd_dep_count = 1))
      AND ((ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('CA', 'WA', 'GA')
            AND ss_net_profit BETWEEN 1000 AND 2000)
        OR (ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('OH', 'TX', 'NM')
            AND ss_net_profit BETWEEN 2000 AND 3000)
        OR (ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('NY', 'FL', 'MI')
            AND ss_net_profit BETWEEN 1500 AND 2500))
    """,
    doc="""TPC-DS q13 (reference tpcds_sql/13.sql) executed: the
    three-way demographic OR-slice x three-way geographic OR-slice
    whole-table averages.  Structure (the OR blocks each re-stating the
    join keys, forcing the optimizer to factor the common conjunct)
    verbatim; each avg spelled exact-decimal-sum / count (house rule).
    Retargets to the derived domains: ss_sales_price bands scaled into
    the l_tax-derived 0..0.08 range, ss_net_profit bands into its
    868..105k range, state lists drawn from the derived 7-state
    ca_state domain; marital/education pairs verbatim (all exist in
    the generated customer_demographics).""",
)

_register(
    "tpcds_q36",
    """
    SELECT CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6)))
                      AS DOUBLE) AS gross_margin,
           i_category, i_class,
           CAST(grouping(i_category) + grouping(i_class) AS INT)
               AS lochierarchy,
           CAST(rank() OVER (
               PARTITION BY grouping(i_category) + grouping(i_class),
                   CASE WHEN grouping(i_class) = 0 THEN i_category END
               ORDER BY CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6)))
                             AS DOUBLE)
                        / CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6)))
                               AS DOUBLE) ASC) AS BIGINT)
               AS rank_within_parent
    FROM store_sales, date_dim d1, item, store
    WHERE d1.d_year = 2000
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND s_state IN ('MO','LA','GA','MI','SC','OH','SD','AL')
    GROUP BY ROLLUP(i_category, i_class)
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN i_category END,
             rank_within_parent
    LIMIT 100
    """,
    doc="""TPC-DS q36 (reference tpcds_sql/36.sql) executed: the gross-
    margin ROLLUP report with rank() partitioned by the grouping-id
    hierarchy -- grouping() inside both the select list and the window
    PARTITION BY, over GROUP BY ROLLUP.  The s_state IN-list is
    verbatim (four of its states exist in the derived domain).  Margin
    numerator/denominator accumulate in DECIMAL then divide as DOUBLE
    (house rule); grouping arithmetic CAST to INT and rank to BIGINT
    on both engines so the driver hashes identical widths.""",
)

_register(
    "tpcds_q41",
    """
    SELECT DISTINCT i_product_name
    FROM item i1
    WHERE i_manufact_id BETWEEN 242 AND 242 + 40
      AND (SELECT COUNT(*) AS item_cnt
           FROM item
           WHERE i_manufact = i1.i_manufact
             AND (((i_category = 'STANDARD' AND
                    (i_color = 'orchid' OR i_color = 'chiffon') AND
                    (i_units = 'Pound' OR i_units = 'Lb') AND
                    (i_size = 'petite' OR i_size = 'medium'))
                OR (i_category = 'STANDARD' AND
                    (i_color = 'lace' OR i_color = 'navy') AND
                    (i_units = 'Each' OR i_units = 'Unknown') AND
                    (i_size = 'N/A' OR i_size = 'large'))
                OR (i_category = 'ECONOMY' AND
                    (i_color = 'peru' OR i_color = 'ivory') AND
                    (i_units = 'N/A' OR i_units = 'Oz') AND
                    (i_size = 'small' OR i_size = 'large'))
                OR (i_category = 'ECONOMY' AND
                    (i_color = 'slate' OR i_color = 'navy') AND
                    (i_units = 'Box' OR i_units = 'Pound') AND
                    (i_size = 'petite' OR i_size = 'medium')))
               OR ((i_category = 'STANDARD' AND
                    (i_color = 'salmon' OR i_color = 'chiffon') AND
                    (i_units = 'Oz' OR i_units = 'Box') AND
                    (i_size = 'petite' OR i_size = 'medium'))
                OR (i_category = 'STANDARD' AND
                    (i_color = 'ivory' OR i_color = 'slate') AND
                    (i_units = 'Lb' OR i_units = 'Unknown') AND
                    (i_size = 'N/A' OR i_size = 'large'))
                OR (i_category = 'ECONOMY' AND
                    (i_color = 'orchid' OR i_color = 'lace') AND
                    (i_units = 'Each' OR i_units = 'Unknown') AND
                    (i_size = 'small' OR i_size = 'large'))
                OR (i_category = 'ECONOMY' AND
                    (i_color = 'navy' OR i_color = 'peru') AND
                    (i_units = 'Pound' OR i_units = 'Oz') AND
                    (i_size = 'petite' OR i_size = 'medium'))))) > 0
    ORDER BY i_product_name
    LIMIT 100
    """,
    doc="""TPC-DS q41 (reference tpcds_sql/41.sql) executed: product
    names of manufacturers that make at least one item matching a deep
    category/color/units/size disjunction -- a correlated scalar COUNT
    subquery over the same dimension.  One structural adaptation: the
    reference spells the correlation as (corr AND block1) OR (corr AND
    block2); here the common i_manufact correlation is factored out
    (logically identical) because Spark's decorrelation rejects
    correlated equality under OR.  Literals retarget to the derived
    item domains: categories -> synthetic p_type values, colors from
    the 8-color palette, units/sizes from the generated 6/5-value
    domains, manufact-id band 742 -> 242 (the derived i_manufact_id is
    mod-500).""",
)

_register(
    "tpcds_q43",
    """
    SELECT s_store_name, s_store_id,
           CAST(SUM(CASE WHEN d_day_name = 'Sunday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS sun_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Monday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS mon_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Tuesday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS tue_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Wednesday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS wed_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Thursday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS thu_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Friday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS fri_sales,
           CAST(SUM(CASE WHEN d_day_name = 'Saturday'
                    THEN CAST(ss_sales_price AS DECIMAL(38,6)) END)
                AS DOUBLE) AS sat_sales
    FROM date_dim, store_sales, store
    WHERE d_date_sk = ss_sold_date_sk
      AND s_store_sk = ss_store_sk
      AND s_gmt_offset = -6
      AND d_year = 1998
    GROUP BY s_store_name, s_store_id
    ORDER BY s_store_name, s_store_id, sun_sales, mon_sales, tue_sales,
             wed_sales, thu_sales, fri_sales, sat_sales
    LIMIT 100
    """,
    doc="""TPC-DS q43 (reference tpcds_sql/43.sql) executed: per-store
    day-of-week sales pivot for one timezone band, all constants
    verbatim (s_gmt_offset = -6 and d_year = 1998 both live in the
    derived domains).  d_day_name derives as Spark date_format('EEEE')
    vs DuckDB dayname() -- both produce full English day names.  The
    NULL-preserving CASE (no ELSE) is the reference's own sparse-pivot
    idiom; sums accumulate in DECIMAL then render DOUBLE.""",
)

_register(
    "tpcds_q48",
    """
    SELECT CAST(SUM(CAST(ss_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_qty
    FROM store_sales, store, customer_demographics,
         customer_address, date_dim
    WHERE s_store_sk = ss_store_sk
      AND ss_sold_date_sk = d_date_sk AND d_year = 1998
      AND ((cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'M'
            AND cd_education_status = '4 yr Degree'
            AND ss_sales_price BETWEEN 0.05 AND 0.08)
        OR (cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'D'
            AND cd_education_status = 'Primary'
            AND ss_sales_price BETWEEN 0.01 AND 0.04)
        OR (cd_demo_sk = ss_cdemo_sk
            AND cd_marital_status = 'U'
            AND cd_education_status = 'Advanced Degree'
            AND ss_sales_price BETWEEN 0.03 AND 0.06))
      AND ((ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('CA', 'GA', 'NY')
            AND ss_net_profit BETWEEN 0 AND 2000)
        OR (ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('TX', 'OH', 'WA')
            AND ss_net_profit BETWEEN 150 AND 3000)
        OR (ss_addr_sk = ca_address_sk
            AND ca_country = 'United States'
            AND ca_state IN ('FL', 'MO', 'WV')
            AND ss_net_profit BETWEEN 50 AND 25000))
    """,
    doc="""TPC-DS q48 (reference tpcds_sql/48.sql) executed: the q13
    sibling without household_demographics -- demographic OR-slice x
    geographic OR-slice total quantity.  The net-profit bands are
    verbatim (they already intersect the derived 868..105k domain);
    marital/education pairs verbatim; sales-price bands scaled into
    the l_tax-derived range and state lists drawn from the derived
    domain, as in q13.  Sum spelled exact-decimal then DOUBLE.""",
)

_register(
    "tpcds_q59",
    """
    , wss AS (
      SELECT d_week_seq, ss_store_sk,
             SUM(CASE WHEN d_day_name = 'Sunday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS sun_sales,
             SUM(CASE WHEN d_day_name = 'Monday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS mon_sales,
             SUM(CASE WHEN d_day_name = 'Tuesday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS tue_sales,
             SUM(CASE WHEN d_day_name = 'Wednesday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS wed_sales,
             SUM(CASE WHEN d_day_name = 'Thursday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS thu_sales,
             SUM(CASE WHEN d_day_name = 'Friday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS fri_sales,
             SUM(CASE WHEN d_day_name = 'Saturday'
                 THEN CAST(ss_sales_price AS DECIMAL(38,6)) END) AS sat_sales
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk
      GROUP BY d_week_seq, ss_store_sk
    )
    SELECT s_store_name1, s_store_id1, d_week_seq1,
           CAST(sun_sales1 AS DOUBLE) / NULLIF(CAST(sun_sales2 AS DOUBLE), 0)
               AS sun_ratio,
           CAST(mon_sales1 AS DOUBLE) / NULLIF(CAST(mon_sales2 AS DOUBLE), 0)
               AS mon_ratio,
           CAST(tue_sales1 AS DOUBLE) / NULLIF(CAST(tue_sales2 AS DOUBLE), 0)
               AS tue_ratio,
           CAST(wed_sales1 AS DOUBLE) / NULLIF(CAST(wed_sales2 AS DOUBLE), 0)
               AS wed_ratio,
           CAST(thu_sales1 AS DOUBLE) / NULLIF(CAST(thu_sales2 AS DOUBLE), 0)
               AS thu_ratio,
           CAST(fri_sales1 AS DOUBLE) / NULLIF(CAST(fri_sales2 AS DOUBLE), 0)
               AS fri_ratio,
           CAST(sat_sales1 AS DOUBLE) / NULLIF(CAST(sat_sales2 AS DOUBLE), 0)
               AS sat_ratio
    FROM
      (SELECT s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
              s_store_id s_store_id1, sun_sales sun_sales1,
              mon_sales mon_sales1, tue_sales tue_sales1,
              wed_sales wed_sales1, thu_sales thu_sales1,
              fri_sales fri_sales1, sat_sales sat_sales1
       FROM wss, store, date_dim d
       WHERE d.d_week_seq = wss.d_week_seq
         AND ss_store_sk = s_store_sk
         AND d_month_seq BETWEEN 1236 AND 1236 + 11) y,
      (SELECT s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
              s_store_id s_store_id2, sun_sales sun_sales2,
              mon_sales mon_sales2, tue_sales tue_sales2,
              wed_sales wed_sales2, thu_sales thu_sales2,
              fri_sales fri_sales2, sat_sales sat_sales2
       FROM wss, store, date_dim d
       WHERE d.d_week_seq = wss.d_week_seq
         AND ss_store_sk = s_store_sk
         AND d_month_seq BETWEEN 1236 + 12 AND 1236 + 23) x
    WHERE s_store_id1 = s_store_id2
      AND d_week_seq1 = d_week_seq2 - 52
    ORDER BY s_store_name1, s_store_id1, d_week_seq1
    LIMIT 100
    """,
    doc="""TPC-DS q59 (reference tpcds_sql/59.sql) executed: week-over-
    week per-store day-of-week sales ratios -- the shared wss CTE
    consumed twice at a 12-month offset and self-joined on
    week_seq - 52.  d_week_seq derives as Sunday-aligned weeks since
    the 1992 epoch (+5270 base) so consecutive years sit exactly 52
    weeks apart; the month-seq windows retarget 1185 -> 1236 (the
    first full year of the synthetic calendar).  The reference's
    day-fan-out join through date_dim (each week matching 7 date rows)
    is kept verbatim -- the duplicate rows are part of the canonical
    answer shape.  Ratio columns divide exact-decimal sums as DOUBLE
    through NULLIF (a week of all-zero derived sales prices would
    otherwise raise under Spark ANSI division while DuckDB yields inf
    -- a real engine divergence, resolved to NULL on both) and are
    aliased on both engines.""",
)

_register(
    "tpcds_q62",
    """
    SELECT substr(w_warehouse_name, 1, 20) AS wh_name, sm_type, web_name,
           CAST(SUM(CASE WHEN ws_ship_date_sk - ws_sold_date_sk <= 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 30
                     AND ws_ship_date_sk - ws_sold_date_sk <= 60
                    THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(SUM(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 60
                     AND ws_ship_date_sk - ws_sold_date_sk <= 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(SUM(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 90
                     AND ws_ship_date_sk - ws_sold_date_sk <= 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(SUM(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS dgt120
    FROM web_sales, warehouse, ship_mode, web_site, date_dim
    WHERE d_month_seq BETWEEN 1248 AND 1248 + 11
      AND ws_ship_date_sk = d_date_sk
      AND ws_warehouse_sk = w_warehouse_sk
      AND ws_ship_mode_sk = sm_ship_mode_sk
      AND ws_web_site_sk = web_site_sk
    GROUP BY substr(w_warehouse_name, 1, 20), sm_type, web_name
    ORDER BY wh_name, sm_type, web_name
    LIMIT 100
    """,
    doc="""TPC-DS q62 (reference tpcds_sql/62.sql) executed: web-channel
    shipping-lag bucket report by warehouse x ship-mode x site.  The
    fact gains a deterministic 0-149-day ship lag plus warehouse /
    ship-mode / web-site keys; the three dimensions are generated
    (5 warehouses, 20 ship modes with a 5-value sm_type domain, 30
    sites folding to 6 web_names).  The reference's quoted '30 days'
    output names become d30..dgt120 aliases on both engines (house
    column-name rule) and the month-seq window retargets 1212 -> 1248
    (in-calendar).  Bucket counts CAST to BIGINT on both sides.""",
)

_register(
    "tpcds_q82",
    """
    SELECT i_item_id, i_item_desc, i_current_price
    FROM item, inventory, date_dim, store_sales
    WHERE i_current_price BETWEEN 920 AND 920 + 30
      AND inv_item_sk = i_item_sk
      AND d_date_sk = inv_date_sk
      AND d_date BETWEEN CAST('2000-05-30' AS DATE)
                     AND CAST('2000-05-30' AS DATE) + INTERVAL 60 DAY
      AND i_manufact_id IN (437, 129, 227, 163)
      AND inv_quantity_on_hand BETWEEN 100 AND 500
      AND ss_item_sk = i_item_sk
    GROUP BY i_item_id, i_item_desc, i_current_price
    ORDER BY i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q82 (reference tpcds_sql/82.sql) executed: items in a
    price band from selected manufacturers with mid-range stock in a
    60-day window that actually sold in stores.  inventory derives as
    a weekly part x date grid with a deterministic quantity hash (the
    TPC-DS inventory table is itself weekly); the GROUP BY dedupes the
    store_sales existence fan-in exactly as the reference intends.
    Retargets: price band 30..60 -> 920..950 (derived p_retailprice
    domain), manufact list (437,129,727,663) -> (437,129,227,163)
    (i_manufact_id is mod-500), date 2002-05-30 -> 2000-05-30
    (in-calendar); quantity band 100..500 verbatim.""",
)

_register(
    "tpcds_q86",
    """
    SELECT CAST(SUM(CAST(ws_net_paid AS DECIMAL(38,6))) AS DOUBLE)
               AS total_sum,
           i_category, i_class,
           CAST(grouping(i_category) + grouping(i_class) AS INT)
               AS lochierarchy,
           CAST(rank() OVER (
               PARTITION BY grouping(i_category) + grouping(i_class),
                   CASE WHEN grouping(i_class) = 0 THEN i_category END
               ORDER BY CAST(SUM(CAST(ws_net_paid AS DECIMAL(38,6)))
                             AS DOUBLE) DESC) AS BIGINT)
               AS rank_within_parent
    FROM web_sales, date_dim d1, item
    WHERE d1.d_month_seq BETWEEN 1248 AND 1248 + 11
      AND d1.d_date_sk = ws_sold_date_sk
      AND i_item_sk = ws_item_sk
    GROUP BY ROLLUP(i_category, i_class)
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN i_category END,
             rank_within_parent
    LIMIT 100
    """,
    doc="""TPC-DS q86 (reference tpcds_sql/86.sql) executed: the q36
    ROLLUP/grouping-rank shape over the WEB channel's net-paid revenue
    (ws_net_paid = extendedprice - discount, deterministic).  Month-seq
    window retargets 1212 -> 1248 (in-calendar); sums accumulate in
    DECIMAL then render DOUBLE; grouping arithmetic and rank CAST to
    fixed widths on both engines.""",
)

_register(
    "tpcds_q99",
    """
    SELECT substr(w_warehouse_name, 1, 20) AS wh_name, sm_type, cc_name,
           CAST(SUM(CASE WHEN cs_ship_date_sk - cs_sold_date_sk <= 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 30
                     AND cs_ship_date_sk - cs_sold_date_sk <= 60
                    THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(SUM(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 60
                     AND cs_ship_date_sk - cs_sold_date_sk <= 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(SUM(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 90
                     AND cs_ship_date_sk - cs_sold_date_sk <= 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(SUM(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS dgt120
    FROM catalog_sales, warehouse, ship_mode, call_center, date_dim
    WHERE d_month_seq BETWEEN 1248 AND 1248 + 11
      AND cs_ship_date_sk = d_date_sk
      AND cs_warehouse_sk = w_warehouse_sk
      AND cs_ship_mode_sk = sm_ship_mode_sk
      AND cs_call_center_sk = cc_call_center_sk
    GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
    ORDER BY wh_name, sm_type, cc_name
    LIMIT 100
    """,
    doc="""TPC-DS q99 (reference tpcds_sql/99.sql) executed: the q62
    sibling over the CATALOG channel -- shipping-lag buckets by
    warehouse x ship-mode x call-center.  The catalog fact gains its
    own deterministic ship lag (a different 17/43 hash than web so the
    two channels' lag distributions differ) plus warehouse/ship-mode/
    call-center keys; call_center is a 6-row generated dimension.
    Same alias and width rules as q62; month-seq retarget 1212 ->
    1248.""",
)


_register(
    "tpcds_q2",
    """
    , wscs AS (
      SELECT sold_date_sk, sales_price
      FROM (SELECT ws_sold_date_sk AS sold_date_sk,
                   ws_ext_sales_price AS sales_price FROM web_sales
            UNION ALL
            SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales) t
    ),
    wswscs AS (
      SELECT d_week_seq,
             SUM(CASE WHEN d_day_name = 'Sunday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS sun_sales,
             SUM(CASE WHEN d_day_name = 'Monday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS mon_sales,
             SUM(CASE WHEN d_day_name = 'Tuesday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS tue_sales,
             SUM(CASE WHEN d_day_name = 'Wednesday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS wed_sales,
             SUM(CASE WHEN d_day_name = 'Thursday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS thu_sales,
             SUM(CASE WHEN d_day_name = 'Friday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS fri_sales,
             SUM(CASE WHEN d_day_name = 'Saturday'
                 THEN CAST(sales_price AS DECIMAL(38,6)) END) AS sat_sales
      FROM wscs, date_dim
      WHERE d_date_sk = sold_date_sk
      GROUP BY d_week_seq
    )
    SELECT d_week_seq1,
           ROUND(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2)
               AS sun_r,
           ROUND(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2)
               AS mon_r,
           ROUND(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2)
               AS tue_r,
           ROUND(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2)
               AS wed_r,
           ROUND(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2)
               AS thu_r,
           ROUND(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2)
               AS fri_r,
           ROUND(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2)
               AS sat_r
    FROM
      (SELECT wswscs.d_week_seq AS d_week_seq1,
              sun_sales AS sun_sales1, mon_sales AS mon_sales1,
              tue_sales AS tue_sales1, wed_sales AS wed_sales1,
              thu_sales AS thu_sales1, fri_sales AS fri_sales1,
              sat_sales AS sat_sales1
       FROM wswscs, date_dim
       WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000) y,
      (SELECT wswscs.d_week_seq AS d_week_seq2,
              sun_sales AS sun_sales2, mon_sales AS mon_sales2,
              tue_sales AS tue_sales2, wed_sales AS wed_sales2,
              thu_sales AS thu_sales2, fri_sales AS fri_sales2,
              sat_sales AS sat_sales2
       FROM wswscs, date_dim
       WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000+1) z
    WHERE d_week_seq1 = d_week_seq2 - 53
    ORDER BY d_week_seq1
    """,
    doc="""TPC-DS q2 (reference tpcds_sql/2.sql) executed: web+catalog
    combined day-of-week weekly sales, year-over-year at a 53-week
    offset (vs q59's 52 — both self-join shapes now covered).  The
    UNION ALL of channels feeds one shared weekly pivot CTE consumed by
    both year slices; day fan-out through date_dim kept verbatim.
    Years retarget 2001 -> 2000 (the calendar's last full pair);
    post-August-2001 weeks produce NULL numerators -> NULL ratios,
    identical on both engines.  Pivot sums accumulate in DECIMAL,
    ratios divide as DOUBLE and ROUND(2) per the reference text.""",
)

_YEAR_TOTAL_SIMPLE = """
    , year_total AS (
      SELECT c_customer_id AS customer_id,
             c_first_name AS customer_first_name,
             c_last_name AS customer_last_name,
             d_year AS dyear,
             MAX(ss_net_paid) AS year_total,
             's' AS sale_type
      FROM customer, store_sales, date_dim
      WHERE c_customer_sk = ss_customer_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      UNION ALL
      SELECT c_customer_id, c_first_name, c_last_name, d_year,
             MAX(ws_net_paid), 'w'
      FROM customer, web_sales, date_dim
      WHERE c_customer_sk = ws_bill_customer_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name, d_year
    )
"""

_register_shared_cte(
    "tpcds_q74",
    _YEAR_TOTAL_SIMPLE + """
    SELECT t_s_secyear.customer_id,
           t_s_secyear.customer_first_name,
           t_s_secyear.customer_last_name
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.sale_type = 's'
      AND t_w_firstyear.sale_type = 'w'
      AND t_s_secyear.sale_type = 's'
      AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 2000
      AND t_s_secyear.dyear = 2000+1
      AND t_w_firstyear.dyear = 2000
      AND t_w_secyear.dyear = 2000+1
      AND t_s_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_w_firstyear.year_total > 0
               THEN t_w_secyear.year_total / t_w_firstyear.year_total
               ELSE NULL END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN t_s_secyear.year_total / t_s_firstyear.year_total
               ELSE NULL END
    ORDER BY 2, 1, 3
    LIMIT 100
    """,
    doc="""TPC-DS q74 (reference tpcds_sql/74.sql) executed: customers
    whose web sales grew faster than their store sales year-over-year —
    one per-customer-per-year CTE consumed FOUR times (store/web ×
    first/second year).  MAX(net_paid) is order-independent so no
    decimal detour is needed; the growth-ratio comparison divides two
    exact row values (bit-identical cross-engine).  Years retarget
    2001 -> 2000 (last full calendar pair); 'year' alias spelled dyear
    as in the reference's own q11 to stay reserved-word-safe.
    r13: year_total's own d_year IN (2000, 2001) reaches the facts only
    at the date_dim joins; the equivalent o_orderdate window is pushed
    below both channel base joins (injective sold_date_sk = f(o_orderdate),
    calendar ends 2001-12-31).  A/B at sf0.1: 0.82 -> 0.72 s min, rows
    identical; pinned with q4/q11 in test_plans.py.""",
    cte="year_total", final_marker="SELECT t_s_secyear.customer_id",
    ref_prefix="t_",
    cte_where={"store_sales": "o_orderdate >= DATE '2000-01-01'",
               "web_sales": "o_orderdate >= DATE '2000-01-01'"},
)

_YEAR_TOTAL_FULL = """
    , year_total AS (
      SELECT c_customer_id AS customer_id,
             c_first_name AS customer_first_name,
             c_last_name AS customer_last_name,
             c_preferred_cust_flag AS customer_preferred_cust_flag,
             c_birth_country AS customer_birth_country,
             c_login AS customer_login,
             c_email_address AS customer_email_address,
             d_year AS dyear,
             CAST(SUM(CAST(ss_ext_list_price - ss_ext_discount_amt
                           AS DECIMAL(38,6))) AS DOUBLE) AS year_total,
             's' AS sale_type
      FROM customer, store_sales, date_dim
      WHERE c_customer_sk = ss_customer_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name,
               c_preferred_cust_flag, c_birth_country, c_login,
               c_email_address, d_year
      UNION ALL
      SELECT c_customer_id, c_first_name, c_last_name,
             c_preferred_cust_flag, c_birth_country, c_login,
             c_email_address, d_year,
             CAST(SUM(CAST(ws_ext_list_price - ws_ext_discount_amt
                           AS DECIMAL(38,6))) AS DOUBLE), 'w'
      FROM customer, web_sales, date_dim
      WHERE c_customer_sk = ws_bill_customer_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name,
               c_preferred_cust_flag, c_birth_country, c_login,
               c_email_address, d_year
    )
"""

_register_shared_cte(
    "tpcds_q11",
    _YEAR_TOTAL_FULL + """
    SELECT t_s_secyear.customer_id,
           t_s_secyear.customer_first_name,
           t_s_secyear.customer_last_name,
           t_s_secyear.customer_email_address
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.sale_type = 's'
      AND t_w_firstyear.sale_type = 'w'
      AND t_s_secyear.sale_type = 's'
      AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 2000
      AND t_s_secyear.dyear = 2000+1
      AND t_w_firstyear.dyear = 2000
      AND t_w_secyear.dyear = 2000+1
      AND t_s_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_w_firstyear.year_total > 0
               THEN t_w_secyear.year_total / t_w_firstyear.year_total
               ELSE 0.0 END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN t_s_secyear.year_total / t_s_firstyear.year_total
               ELSE 0.0 END
    ORDER BY t_s_secyear.customer_id,
             t_s_secyear.customer_first_name,
             t_s_secyear.customer_last_name,
             t_s_secyear.customer_email_address
    LIMIT 100
    """,
    doc="""TPC-DS q11 (reference tpcds_sql/11.sql) executed: the q74
    shape with the full 7-attribute customer grouping (preferred flag,
    birth country, login, email all derived deterministically) and
    SUM(ext_list_price − ext_discount_amt) totals — accumulated in
    DECIMAL then compared as DOUBLE ratios (house rule).  Years
    retarget 2001 -> 2000.
    r13: o_orderdate >= 2000-01-01 pushed below both channel base joins
    (same injectivity argument as q74).  A/B at sf0.1: 1.42 -> 1.21 s
    min, rows identical.""",
    cte="year_total", final_marker="SELECT t_s_secyear.customer_id",
    ref_prefix="t_",
    cte_where={"store_sales": "o_orderdate >= DATE '2000-01-01'",
               "web_sales": "o_orderdate >= DATE '2000-01-01'"},
)

_register_shared_cte(
    "tpcds_q4",
    """
    , year_total AS (
      SELECT c_customer_id AS customer_id,
             c_first_name AS customer_first_name,
             c_last_name AS customer_last_name,
             d_year AS dyear,
             CAST(SUM(CAST(((ss_ext_list_price - ss_ext_wholesale_cost
                             - ss_ext_discount_amt) + ss_ext_sales_price) / 2
                           AS DECIMAL(38,6))) AS DOUBLE) AS year_total,
             's' AS sale_type
      FROM customer, store_sales, date_dim
      WHERE c_customer_sk = ss_customer_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      UNION ALL
      SELECT c_customer_id, c_first_name, c_last_name, d_year,
             CAST(SUM(CAST(((cs_ext_list_price - cs_ext_wholesale_cost
                             - cs_ext_discount_amt) + cs_ext_sales_price) / 2
                           AS DECIMAL(38,6))) AS DOUBLE), 'c'
      FROM customer, catalog_sales, date_dim
      WHERE c_customer_sk = cs_bill_customer_sk
        AND cs_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      UNION ALL
      SELECT c_customer_id, c_first_name, c_last_name, d_year,
             CAST(SUM(CAST(((ws_ext_list_price - ws_ext_wholesale_cost
                             - ws_ext_discount_amt) + ws_ext_sales_price) / 2
                           AS DECIMAL(38,6))) AS DOUBLE), 'w'
      FROM customer, web_sales, date_dim
      WHERE c_customer_sk = ws_bill_customer_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year IN (2000, 2000+1)
      GROUP BY c_customer_id, c_first_name, c_last_name, d_year
    )
    SELECT t_s_secyear.customer_id,
           t_s_secyear.customer_first_name,
           t_s_secyear.customer_last_name
    FROM year_total t_s_firstyear, year_total t_s_secyear,
         year_total t_c_firstyear, year_total t_c_secyear,
         year_total t_w_firstyear, year_total t_w_secyear
    WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_c_secyear.customer_id
      AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      AND t_s_firstyear.sale_type = 's'
      AND t_c_firstyear.sale_type = 'c'
      AND t_w_firstyear.sale_type = 'w'
      AND t_s_secyear.sale_type = 's'
      AND t_c_secyear.sale_type = 'c'
      AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 2000
      AND t_s_secyear.dyear = 2000+1
      AND t_c_firstyear.dyear = 2000
      AND t_c_secyear.dyear = 2000+1
      AND t_w_firstyear.dyear = 2000
      AND t_w_secyear.dyear = 2000+1
      AND t_s_firstyear.year_total > 0
      AND t_c_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND CASE WHEN t_c_firstyear.year_total > 0
               THEN t_c_secyear.year_total / t_c_firstyear.year_total
               ELSE NULL END
        > CASE WHEN t_s_firstyear.year_total > 0
               THEN t_s_secyear.year_total / t_s_firstyear.year_total
               ELSE NULL END
      AND CASE WHEN t_c_firstyear.year_total > 0
               THEN t_c_secyear.year_total / t_c_firstyear.year_total
               ELSE NULL END
        > CASE WHEN t_w_firstyear.year_total > 0
               THEN t_w_secyear.year_total / t_w_firstyear.year_total
               ELSE NULL END
    ORDER BY t_s_secyear.customer_id,
             t_s_secyear.customer_first_name,
             t_s_secyear.customer_last_name
    LIMIT 100
    """,
    doc="""TPC-DS q4 (reference tpcds_sql/4.sql) executed: the full
    three-channel year-over-year growth query — one profit-formula CTE
    ((list − wholesale − discount + sales)/2, all derived measures)
    consumed SIX times.  Catalog growth must beat both store and web
    growth.  Row-level halving stays in IEEE doubles (deterministic per
    row); per-year totals accumulate in DECIMAL then compare as DOUBLE
    ratios.  Years retarget 2001 -> 2000.
    r13: o_orderdate >= 2000-01-01 pushed below all three channel base
    joins (same injectivity argument as q74).  A/B at sf0.1:
    1.64 -> 1.38 s min, rows identical.""",
    cte="year_total", final_marker="SELECT t_s_secyear.customer_id",
    ref_prefix="t_",
    cte_where={"store_sales": "o_orderdate >= DATE '2000-01-01'",
               "web_sales": "o_orderdate >= DATE '2000-01-01'",
               "catalog_sales": "o_orderdate >= DATE '2000-01-01'"},
)

_register(
    "tpcds_q38",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_cust FROM (
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM store_sales, date_dim, customer
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      INTERSECT
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM catalog_sales, date_dim, customer
      WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      INTERSECT
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM web_sales, date_dim, customer
      WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
    ) hot_cust
    LIMIT 100
    """,
    doc="""TPC-DS q38 (reference tpcds_sql/38.sql) executed: customers
    active on the same DAY in all three channels — DISTINCT
    name×date sets INTERSECTed across store/catalog/web, counted.
    Month-seq window retargets 1212 -> 1248 (in-calendar).""",
)

_register(
    "tpcds_q87",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cool_cust FROM (
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM store_sales, date_dim, customer
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      EXCEPT
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM catalog_sales, date_dim, customer
      WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      EXCEPT
      SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM web_sales, date_dim, customer
      WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
    ) cool_cust
    """,
    doc="""TPC-DS q87 (reference tpcds_sql/87.sql) executed: q38's
    EXCEPT twin — store-channel name×date visits with no same-day
    catalog or web activity.  Left-associative EXCEPT chain exactly as
    the reference parses it; month-seq retarget 1212 -> 1248.""",
)


_register(
    "tpcds_q53",
    """
    SELECT * FROM (
      SELECT i_manufact_id,
             CAST(SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_sales,
             CAST(SUM(SUM(CAST(ss_sales_price AS DECIMAL(38,6))))
                      OVER (PARTITION BY i_manufact_id) AS DOUBLE)
                 / COUNT(SUM(ss_sales_price))
                      OVER (PARTITION BY i_manufact_id)
                 AS avg_quarterly_sales
      FROM item, store_sales, date_dim, store
      WHERE ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND d_month_seq IN (1248,1248+1,1248+2,1248+3,1248+4,1248+5,
                            1248+6,1248+7,1248+8,1248+9,1248+10,1248+11)
        AND ((i_category IN ('ECONOMY','STANDARD','LARGE')
              AND i_class IN ('CLASS#0','CLASS#1','CLASS#2','CLASS#3')
              AND i_brand IN ('Brand#14','Brand#7','Brand#9','Brand#19'))
          OR (i_category IN ('MEDIUM','SMALL','PROMO')
              AND i_class IN ('CLASS#4','CLASS#5','CLASS#6')
              AND i_brand IN ('Brand#1','Brand#21','Brand#3','Brand#11')))
      GROUP BY i_manufact_id, d_qoy
    ) tmp1
    WHERE CASE WHEN avg_quarterly_sales > 0
               THEN ABS(sum_sales - avg_quarterly_sales)
                    / avg_quarterly_sales
               ELSE NULL END > 0.1
    ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
    LIMIT 100
    """,
    doc="""TPC-DS q53 (reference tpcds_sql/53.sql) executed: quarterly
    manufacturer sales vs their all-quarter average — the
    avg(sum(x)) OVER (PARTITION BY ...) window-over-aggregate spelled
    as exact-decimal SUM-of-SUMs / COUNT (a native double avg is
    accumulation-order-dependent; house rule).  Category/class/brand
    IN-lists retarget to the derived vocabularies (p_type / CLASS#k /
    Brand#1..25); month-seq window 1212 -> 1248.""",
)

_register(
    "tpcds_q63",
    """
    SELECT * FROM (
      SELECT i_manager_id,
             CAST(SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_sales,
             CAST(SUM(SUM(CAST(ss_sales_price AS DECIMAL(38,6))))
                      OVER (PARTITION BY i_manager_id) AS DOUBLE)
                 / COUNT(SUM(ss_sales_price))
                      OVER (PARTITION BY i_manager_id)
                 AS avg_monthly_sales
      FROM item, store_sales, date_dim, store
      WHERE ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND d_month_seq IN (1248,1248+1,1248+2,1248+3,1248+4,1248+5,
                            1248+6,1248+7,1248+8,1248+9,1248+10,1248+11)
        AND ((i_category IN ('ECONOMY','STANDARD','LARGE')
              AND i_class IN ('CLASS#0','CLASS#1','CLASS#2','CLASS#3')
              AND i_brand IN ('Brand#14','Brand#7','Brand#9','Brand#19'))
          OR (i_category IN ('MEDIUM','SMALL','PROMO')
              AND i_class IN ('CLASS#4','CLASS#5','CLASS#6')
              AND i_brand IN ('Brand#1','Brand#21','Brand#3','Brand#11')))
      GROUP BY i_manager_id, d_moy
    ) tmp1
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY i_manager_id, avg_monthly_sales, sum_sales
    LIMIT 100
    """,
    doc="""TPC-DS q63 (reference tpcds_sql/63.sql) executed: q53's
    manager-keyed monthly sibling (GROUP BY i_manager_id, d_moy).
    Same decimal-exact window-average spelling and vocabulary
    retargets.""",
)

_register(
    "tpcds_q89",
    """
    SELECT * FROM (
      SELECT i_category, i_class, i_brand,
             s_store_name, s_company_name, d_moy,
             CAST(SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_sales,
             CAST(SUM(SUM(CAST(ss_sales_price AS DECIMAL(38,6)))) OVER
                      (PARTITION BY i_category, i_brand, s_store_name,
                                    s_company_name) AS DOUBLE)
                 / COUNT(SUM(ss_sales_price)) OVER
                      (PARTITION BY i_category, i_brand, s_store_name,
                                    s_company_name)
                 AS avg_monthly_sales
      FROM item, store_sales, date_dim, store
      WHERE ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND d_year IN (2000)
        AND ((i_category IN ('ECONOMY','STANDARD','LARGE')
              AND i_class IN ('CLASS#0','CLASS#1','CLASS#2'))
          OR (i_category IN ('MEDIUM','SMALL','PROMO')
              AND i_class IN ('CLASS#4','CLASS#5','CLASS#6')))
      GROUP BY i_category, i_class, i_brand,
               s_store_name, s_company_name, d_moy
    ) tmp1
    WHERE CASE WHEN avg_monthly_sales <> 0
               THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY sum_sales - avg_monthly_sales, s_store_name,
             i_category, i_class, i_brand, d_moy
    LIMIT 100
    """,
    doc="""TPC-DS q89 (reference tpcds_sql/89.sql) executed: monthly
    class sales vs the brand-store yearly average.  The bare
    ORDER BY (diff, s_store_name) is tie-ambiguous under LIMIT across
    brands within a store, so the full grouping key is appended as a
    uniqueness tiebreak (same policy as q33/q60).  Window average
    spelled decimal-exact; class/category lists retargeted.""",
)

def _v1_monthly_body(entity_cols: str, fact: str, p: str, entity_join: str,
                     entity_tbl: str) -> str:
    """q47/q57 shared shape: monthly {store|call-center} brand sales with
    RANK-sequence lag/lead self-joins and a decimal-exact yearly window
    average.  entity_cols is the comma-joined entity column list
    (s_store_name, s_company_name for q47; cc_name for q57)."""
    cols = [c.strip() for c in entity_cols.split(",")]
    part = ", ".join(["i_category", "i_brand"] + cols)
    corr = "\n        AND ".join(
        f"v1.{c} = v1_lag.{c}\n        AND v1.{c} = v1_lead.{c}" for c in cols
    )
    return f"""
    , v1 AS (
      SELECT i_category, i_brand, {entity_cols},
             d_year, d_moy,
             SUM(CAST({p}_sales_price AS DECIMAL(38,6))) AS sum_sales,
             SUM(SUM(CAST({p}_sales_price AS DECIMAL(38,6)))) OVER
                 (PARTITION BY {part}, d_year) AS tot_sales,
             COUNT(SUM({p}_sales_price)) OVER
                 (PARTITION BY {part}, d_year) AS n_months,
             RANK() OVER
                 (PARTITION BY {part}
                  ORDER BY d_year, d_moy) AS rn
      FROM item, {fact}, date_dim, {entity_tbl}
      WHERE {p}_item_sk = i_item_sk
        AND {p}_sold_date_sk = d_date_sk
        AND {entity_join}
        AND (d_year = 2000 OR (d_year = 2000-1 AND d_moy = 12)
             OR (d_year = 2000+1 AND d_moy = 1))
      GROUP BY i_category, i_brand, {entity_cols}, d_year, d_moy
    ),
    v2 AS (
      SELECT v1.i_category, v1.i_brand, v1.d_year, v1.d_moy,
             CAST(v1.tot_sales AS DOUBLE) / v1.n_months
                 AS avg_monthly_sales,
             CAST(v1.sum_sales AS DOUBLE) AS sum_sales,
             CAST(v1_lag.sum_sales AS DOUBLE) AS psum,
             CAST(v1_lead.sum_sales AS DOUBLE) AS nsum
      FROM v1, v1 v1_lag, v1 v1_lead
      WHERE v1.i_category = v1_lag.i_category
        AND v1.i_category = v1_lead.i_category
        AND v1.i_brand = v1_lag.i_brand
        AND v1.i_brand = v1_lead.i_brand
        AND {corr}
        AND v1.rn = v1_lag.rn + 1
        AND v1.rn = v1_lead.rn - 1
    )
    SELECT * FROM v2
    WHERE d_year = 2000
      AND avg_monthly_sales > 0
      AND CASE WHEN avg_monthly_sales > 0
               THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > 0.1
    ORDER BY sum_sales - avg_monthly_sales, nsum,
             i_category, i_brand, d_moy, psum
    LIMIT 100
"""


_register(
    "tpcds_q47",
    _v1_monthly_body("s_store_name, s_company_name", "store_sales", "ss",
                     "ss_store_sk = s_store_sk", "store"),
    doc="""TPC-DS q47 (reference tpcds_sql/47.sql) executed: monthly
    brand-store sales with previous/next-month self-joins on a
    RANK-numbered month sequence (13-month window: Dec of the prior
    year through Jan of the next).  The avg(sum) OVER window is
    decimal-exact SUM-of-SUMs / COUNT; v2's store columns are not
    projected (as in the reference), so the ORDER BY appends every
    projected column as a uniqueness tiebreak for the LIMIT.  Year
    2000 unchanged from the reference (already in-calendar).""",
)

_register(
    "tpcds_q57",
    _v1_monthly_body("cc_name", "catalog_sales", "cs",
                     "cs_call_center_sk = cc_call_center_sk", "call_center"),
    doc="""TPC-DS q57 (reference tpcds_sql/57.sql) executed: q47's
    catalog-channel twin — call_center replaces store (the reference
    drops s_company_name likewise), cs_sales_price replaces
    ss_sales_price, same RANK-sequence lag/lead self-joins and
    decimal-exact window average.  Built from the shared q47 template
    so the two stay in lockstep.""",
)


_register(
    "tpcds_q25",
    """
    SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
           CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS store_sales_profit,
           CAST(SUM(CAST(sr_net_loss AS DECIMAL(38,6))) AS DOUBLE)
               AS store_returns_loss,
           CAST(SUM(CAST(cs_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS catalog_sales_profit
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_moy = 4
      AND d1.d_year = 2000
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_moy BETWEEN 4 AND 10
      AND d2.d_year = 2000
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_moy BETWEEN 4 AND 10
      AND d3.d_year = 2000
    GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
    ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
    LIMIT 100
    """,
    doc="""TPC-DS q25 (reference tpcds_sql/25.sql) executed: the classic
    sold-then-returned-then-rebought-by-catalog 3-fact chain —
    store_sales joined to store_returns on the
    (customer,item,ticket) composite, then to catalog_sales on
    (customer,item), each fact with its own date_dim role (d1/d2/d3).
    The derived store_returns gains cs_net_profit's counterpart
    sr_net_loss; ALL date constants verbatim (April 2000 sale,
    Apr-Oct return and catalog windows are in-calendar).""",
)

_register(
    "tpcds_q29",
    """
    SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
           CAST(SUM(CAST(ss_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS store_sales_quantity,
           CAST(SUM(CAST(sr_return_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS store_returns_quantity,
           CAST(SUM(CAST(cs_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS catalog_sales_quantity
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_moy = 4
      AND d1.d_year = 1999
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_moy BETWEEN 4 AND 4 + 3
      AND d2.d_year = 1999
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_year IN (1999, 1999+1, 1999+2)
    GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
    ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
    LIMIT 100
    """,
    doc="""TPC-DS q29 (reference tpcds_sql/29.sql) executed: q25's
    quantity sibling with a THREE-YEAR catalog rebuy window
    (1999-2001, entirely in-calendar — every constant verbatim).""",
)

# Exact decimal sums, but ALL arithmetic between them in IEEE DOUBLE:
# decimal division scale rules differ between Spark and DuckDB, so a
# decimal intermediate rounds differently (observed: q39 cov off by
# 1e-9); double ops on exact inputs are bit-identical cross-engine.
_STDDEV = (
    "SQRT((CAST(SUM(CAST({c} AS DECIMAL(38,6)) * CAST({c} AS DECIMAL(38,6)))"
    " AS DOUBLE)"
    " - CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
    " * CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"
    " / COUNT({c})) / NULLIF(COUNT({c}) - 1, 0))"
)
_AVGQ = "CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({c})"

_register(
    "tpcds_q17",
    f"""
    SELECT i_item_id, i_item_desc, s_state,
           CAST(COUNT(ss_quantity) AS BIGINT) AS store_sales_quantitycount,
           {_AVGQ.format(c='ss_quantity')} AS store_sales_quantityave,
           CAST({_STDDEV.format(c='ss_quantity')} AS DOUBLE)
               AS store_sales_quantitystdev,
           CAST({_STDDEV.format(c='ss_quantity')} AS DOUBLE)
               / ({_AVGQ.format(c='ss_quantity')})
               AS store_sales_quantitycov,
           CAST(COUNT(sr_return_quantity) AS BIGINT)
               AS store_returns_quantitycount,
           {_AVGQ.format(c='sr_return_quantity')}
               AS store_returns_quantityave,
           CAST({_STDDEV.format(c='sr_return_quantity')} AS DOUBLE)
               AS store_returns_quantitystdev,
           CAST({_STDDEV.format(c='sr_return_quantity')} AS DOUBLE)
               / ({_AVGQ.format(c='sr_return_quantity')})
               AS store_returns_quantitycov,
           CAST(COUNT(cs_quantity) AS BIGINT) AS catalog_sales_quantitycount,
           {_AVGQ.format(c='cs_quantity')} AS catalog_sales_quantityave,
           CAST({_STDDEV.format(c='cs_quantity')} AS DOUBLE)
               AS catalog_sales_quantitystdev,
           CAST({_STDDEV.format(c='cs_quantity')} AS DOUBLE)
               / ({_AVGQ.format(c='cs_quantity')})
               AS catalog_sales_quantitycov
    FROM store_sales, store_returns, catalog_sales,
         date_dim d1, date_dim d2, date_dim d3, store, item
    WHERE d1.d_quarter_name = '1998Q1'
      AND d1.d_date_sk = ss_sold_date_sk
      AND i_item_sk = ss_item_sk
      AND s_store_sk = ss_store_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_item_sk = sr_item_sk
      AND ss_ticket_number = sr_ticket_number
      AND sr_returned_date_sk = d2.d_date_sk
      AND d2.d_quarter_name IN ('1998Q1','1998Q2','1998Q3')
      AND sr_customer_sk = cs_bill_customer_sk
      AND sr_item_sk = cs_item_sk
      AND cs_sold_date_sk = d3.d_date_sk
      AND d3.d_quarter_name IN ('1998Q1','1998Q2','1998Q3')
    GROUP BY i_item_id, i_item_desc, s_state
    ORDER BY i_item_id, i_item_desc, s_state
    LIMIT 100
    """,
    doc="""TPC-DS q17 (reference tpcds_sql/17.sql) executed: the 3-fact
    chain reporting per-item quantity statistics — count / mean /
    stddev_samp / coefficient of variation for each leg.  A native
    stddev_samp over doubles is accumulation-order-dependent, so it is
    spelled from EXACT decimal moments: sqrt((Σx² − (Σx)²/n)/(n−1)) —
    one deterministic double rounding at the sqrt.  d_quarter_name
    derives as year||'Q'||quarter; all 1998Q* constants verbatim.""",
)

_register(
    "tpcds_q50",
    """
    SELECT s_store_name, s_company_id, s_street_number, s_street_name,
           s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
           CAST(SUM(CASE WHEN sr_returned_date_sk - ss_sold_date_sk <= 30
                    THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 30
                     AND sr_returned_date_sk - ss_sold_date_sk <= 60
                    THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
           CAST(SUM(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 60
                     AND sr_returned_date_sk - ss_sold_date_sk <= 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
           CAST(SUM(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 90
                     AND sr_returned_date_sk - ss_sold_date_sk <= 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
           CAST(SUM(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 120
                    THEN 1 ELSE 0 END) AS BIGINT) AS dgt120
    FROM store_sales, store_returns, store, date_dim d1, date_dim d2
    WHERE d2.d_year = 2000
      AND d2.d_moy = 9
      AND ss_ticket_number = sr_ticket_number
      AND ss_item_sk = sr_item_sk
      AND ss_sold_date_sk = d1.d_date_sk
      AND sr_returned_date_sk = d2.d_date_sk
      AND ss_customer_sk = sr_customer_sk
      AND ss_store_sk = s_store_sk
    GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
             s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
    ORDER BY s_store_name, s_company_id, s_street_number, s_street_name,
             s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
    LIMIT 100
    """,
    doc="""TPC-DS q50 (reference tpcds_sql/50.sql) executed: return-lag
    buckets (sale date -> return date) for September-2000 returns,
    reported per full store address — the store dim gains its
    company-id/street/suite attributes as key functions.  The quoted
    '30 days' output names become d30..dgt120 (house column-name rule);
    every date constant verbatim.""",
)

_register(
    "tpcds_q93",
    """
    SELECT ss_customer_sk,
           CAST(SUM(CAST(act_sales AS DECIMAL(38,6))) AS DOUBLE) AS sumsales
    FROM (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
                 CASE WHEN sr_return_quantity IS NOT NULL
                      THEN (ss_quantity - sr_return_quantity) * ss_sales_price
                      ELSE ss_quantity * ss_sales_price END AS act_sales
          FROM store_sales
          LEFT OUTER JOIN store_returns
            ON (sr_item_sk = ss_item_sk
                AND sr_ticket_number = ss_ticket_number), reason
          WHERE sr_reason_sk = r_reason_sk
            AND r_reason_desc = 'Did not like the warranty') t
    GROUP BY ss_customer_sk
    ORDER BY sumsales, ss_customer_sk
    LIMIT 100
    """,
    doc="""TPC-DS q93 (reference tpcds_sql/93.sql) executed: actual
    sales net of warranty-reason returns — a LEFT OUTER fact-fact join
    whose null-extension is then constrained by the reason filter
    (the reference's own subtle shape: the WHERE re-inner-joins the
    outer join).  reason is a 35-row generated dimension with the
    verbatim 'Did not like the warranty' description at sk 1.""",
)


def _excess_discount(name: str, fact: str, p: str, sql_ref: str) -> None:
    _register(
        name,
        f"""
    SELECT CAST(SUM(CAST({p}_ext_discount_amt AS DECIMAL(38,6))) AS DOUBLE)
               AS excess_discount_amt
    FROM {fact}, item, date_dim
    WHERE i_manufact_id = 269
      AND i_item_sk = {p}_item_sk
      AND d_date BETWEEN CAST('1998-03-18' AS DATE)
                     AND CAST('1998-03-18' AS DATE) + INTERVAL 90 DAY
      AND d_date_sk = {p}_sold_date_sk
      AND {p}_ext_discount_amt >
          (SELECT 1.3 * (CAST(SUM(CAST({p}_ext_discount_amt
                                       AS DECIMAL(38,6))) AS DOUBLE)
                         / COUNT({p}_ext_discount_amt))
           FROM {fact}, date_dim
           WHERE {p}_item_sk = i_item_sk
             AND d_date BETWEEN CAST('1998-03-18' AS DATE)
                            AND CAST('1998-03-18' AS DATE) + INTERVAL 90 DAY
             AND d_date_sk = {p}_sold_date_sk)
    LIMIT 100
    """,
        doc=f"""TPC-DS {name[6:]} (reference tpcds_sql/{sql_ref}) executed:
    total discount on {fact} rows whose discount exceeds 1.3x the
    per-item 90-day average — a correlated scalar-average subquery
    against the same fact.  The quoted 'excess discount amount' output
    name becomes excess_discount_amt (house column-name rule); the avg
    is exact-decimal-sum / count; manufacturer and date constants
    verbatim (both in the derived domains).""",
    )


_excess_discount("tpcds_q32", "catalog_sales", "cs", "32.sql")
_excess_discount("tpcds_q92", "web_sales", "ws", "92.sql")

_register(
    "tpcds_q37",
    """
    SELECT i_item_id, i_item_desc, i_current_price
    FROM item, inventory, date_dim, catalog_sales
    WHERE i_current_price BETWEEN 920 AND 920 + 30
      AND inv_item_sk = i_item_sk
      AND d_date_sk = inv_date_sk
      AND d_date BETWEEN CAST('2001-06-02' AS DATE)
                     AND CAST('2001-06-02' AS DATE) + INTERVAL 60 DAY
      AND i_manufact_id IN (178, 464, 418, 349)
      AND inv_quantity_on_hand BETWEEN 100 AND 500
      AND cs_item_sk = i_item_sk
    GROUP BY i_item_id, i_item_desc, i_current_price
    ORDER BY i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q37 (reference tpcds_sql/37.sql) executed: q82's
    catalog twin — priced in-band manufacturer items with mid-range
    inventory in a 60-day window that sold by catalog.  Date
    '2001-06-02' verbatim (in-calendar); price band 22..52 -> 920..950
    and the manufact list folded into the mod-500 domain, as q82.""",
)

_register(
    "tpcds_q61",
    """
    SELECT CAST(promotions AS DOUBLE) AS promotions,
           CAST(total AS DOUBLE) AS total,
           CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100
               AS promo_pct
    FROM
      (SELECT SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS promotions
       FROM store_sales, store, promotion, date_dim, customer,
            customer_address, item
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND ss_promo_sk = p_promo_sk
         AND ss_customer_sk = c_customer_sk
         AND ca_address_sk = c_current_addr_sk
         AND ss_item_sk = i_item_sk
         AND ca_gmt_offset = -7
         AND i_category = 'ECONOMY'
         AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
              OR p_channel_tv = 'Y')
         AND s_gmt_offset = -7
         AND d_year = 1999
         AND d_moy = 11) promotional_sales,
      (SELECT SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS total
       FROM store_sales, store, date_dim, customer, customer_address, item
       WHERE ss_sold_date_sk = d_date_sk
         AND ss_store_sk = s_store_sk
         AND ss_customer_sk = c_customer_sk
         AND ca_address_sk = c_current_addr_sk
         AND ss_item_sk = i_item_sk
         AND ca_gmt_offset = -7
         AND i_category = 'ECONOMY'
         AND s_gmt_offset = -7
         AND d_year = 1999
         AND d_moy = 11) all_sales
    ORDER BY promotions, total
    LIMIT 100
    """,
    doc="""TPC-DS q61 (reference tpcds_sql/61.sql) executed: share of
    one geography's November category sales driven by dmail/email/tv
    promotions — two scalar star aggregates cross-joined into one row.
    promotion gains its dmail/tv channel flags; the reference's
    DECIMAL(15,4) ratio cast becomes exact-decimal sums divided as
    DOUBLE (the 15-digit width would overflow at large SF; house
    scale rule).  ca_gmt_offset/s_gmt_offset = -7 verbatim (both
    derived domains include -7); 'Books' -> 'ECONOMY'.""",
)

_register(
    "tpcds_q58",
    """
    , ss_items AS (
      SELECT i_item_id AS item_id,
             SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS ss_item_rev
      FROM store_sales, item, date_dim
      WHERE ss_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
                                           WHERE d_date =
                                                 CAST('1998-02-19' AS DATE)))
        AND ss_sold_date_sk = d_date_sk
      GROUP BY i_item_id
    ),
    cs_items AS (
      SELECT i_item_id AS item_id,
             SUM(CAST(cs_ext_sales_price AS DECIMAL(38,6))) AS cs_item_rev
      FROM catalog_sales, item, date_dim
      WHERE cs_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
                                           WHERE d_date =
                                                 CAST('1998-02-19' AS DATE)))
        AND cs_sold_date_sk = d_date_sk
      GROUP BY i_item_id
    ),
    ws_items AS (
      SELECT i_item_id AS item_id,
             SUM(CAST(ws_ext_sales_price AS DECIMAL(38,6))) AS ws_item_rev
      FROM web_sales, item, date_dim
      WHERE ws_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
                                           WHERE d_date =
                                                 CAST('1998-02-19' AS DATE)))
        AND ws_sold_date_sk = d_date_sk
      GROUP BY i_item_id
    )
    SELECT ss_items.item_id,
           CAST(ss_item_rev AS DOUBLE) AS ss_item_rev,
           CAST(ss_item_rev AS DOUBLE)
               / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
                   + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS ss_dev,
           CAST(cs_item_rev AS DOUBLE) AS cs_item_rev,
           CAST(cs_item_rev AS DOUBLE)
               / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
                   + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS cs_dev,
           CAST(ws_item_rev AS DOUBLE) AS ws_item_rev,
           CAST(ws_item_rev AS DOUBLE)
               / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
                   + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS ws_dev,
           (CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
            + CAST(ws_item_rev AS DOUBLE)) / 3 AS average
    FROM ss_items, cs_items, ws_items
    WHERE ss_items.item_id = cs_items.item_id
      AND ss_items.item_id = ws_items.item_id
      AND CAST(ss_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(cs_item_rev AS DOUBLE)
              AND 5.0 * CAST(cs_item_rev AS DOUBLE)
      AND CAST(ss_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(ws_item_rev AS DOUBLE)
              AND 5.0 * CAST(ws_item_rev AS DOUBLE)
      AND CAST(cs_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(ss_item_rev AS DOUBLE)
              AND 5.0 * CAST(ss_item_rev AS DOUBLE)
      AND CAST(cs_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(ws_item_rev AS DOUBLE)
              AND 5.0 * CAST(ws_item_rev AS DOUBLE)
      AND CAST(ws_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(ss_item_rev AS DOUBLE)
              AND 5.0 * CAST(ss_item_rev AS DOUBLE)
      AND CAST(ws_item_rev AS DOUBLE)
          BETWEEN 0.2 * CAST(cs_item_rev AS DOUBLE)
              AND 5.0 * CAST(cs_item_rev AS DOUBLE)
    ORDER BY ss_items.item_id, ss_item_rev
    LIMIT 100
    """,
    doc="""TPC-DS q58 (reference tpcds_sql/58.sql) executed: items
    whose one-week revenues are within 10% across all three channels —
    per-channel CTEs each anchored to the week containing one date via
    a nested scalar week-seq subquery, then a 6-way mutual band
    filter.  '1998-02-19' verbatim (in-calendar); revenues accumulate
    in DECIMAL and every band/ratio comparison runs in DOUBLE on the
    exact sums.""",
)


def _state_return_outliers(name: str, sql_ref: str, returns_tbl: str, p: str,
                           amt: str, year: int, out_cols: str,
                           order_cols: str, doc_extra: str) -> None:
    _register(
        name,
        f"""
    , customer_total_return AS (
      SELECT {p}_returning_customer_sk AS ctr_customer_sk,
             ca_state AS ctr_state,
             CAST(SUM(CAST({amt} AS DECIMAL(38,6))) AS DOUBLE)
                 AS ctr_total_return
      FROM {returns_tbl}, date_dim, customer_address
      WHERE {p}_returned_date_sk = d_date_sk
        AND d_year = {year}
        AND {p}_returning_addr_sk = ca_address_sk
      GROUP BY {p}_returning_customer_sk, ca_state
    )
    SELECT {out_cols}
    FROM customer_total_return ctr1, customer_address, customer
    WHERE ctr1.ctr_total_return >
          (SELECT AVG(ctr_total_return) * 1.2
           FROM customer_total_return ctr2
           WHERE ctr1.ctr_state = ctr2.ctr_state)
      AND ca_address_sk = c_current_addr_sk
      AND ca_state = 'GA'
      AND ctr1.ctr_customer_sk = c_customer_sk
    ORDER BY {order_cols}
    LIMIT 100
    """,
        doc=f"""TPC-DS {name[6:]} (reference tpcds_sql/{sql_ref}) executed:
    customers whose {returns_tbl} totals exceed 1.2x their state's
    average — the q1 correlated-CTE shape on the {returns_tbl} table
    keyed by customer ADDRESS state rather than store.  {doc_extra}
    ca_state 'IL' -> 'GA' (derived 7-state domain); totals accumulate
    in DECIMAL and compare as DOUBLE.""",
    )


_state_return_outliers(
    "tpcds_q30", "30.sql", "web_returns", "wr", "wr_return_amt", 2000,
    "c_customer_id, c_salutation, c_first_name, c_last_name,"
    " c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,"
    " c_birth_country, c_login, c_email_address, c_last_review_date_sk,"
    " ctr_total_return",
    "c_customer_id, c_salutation, c_first_name, c_last_name,"
    " c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,"
    " c_birth_country, c_login, c_email_address, c_last_review_date_sk,"
    " ctr_total_return",
    "The customer dim gains its birth-date/review attributes as key"
    " functions; d_year 2002 -> 2000 (in-calendar).",
)

_state_return_outliers(
    "tpcds_q81", "81.sql", "catalog_returns", "cr",
    "cr_return_amt_inc_tax", 1998,
    "c_customer_id, c_salutation, c_first_name, c_last_name,"
    " ca_street_number, ca_street_name, ca_street_type, ca_suite_number,"
    " ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,"
    " ca_location_type, ctr_total_return",
    "c_customer_id, c_salutation, c_first_name, c_last_name,"
    " ca_street_number, ca_street_name, ca_street_type, ca_suite_number,"
    " ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,"
    " ca_location_type, ctr_total_return",
    "Reports the full derived customer address (street/suite/location"
    " attributes added as key functions); d_year 1998 verbatim.",
)

_register(
    "tpcds_q83",
    """
    , sr_items AS (
      SELECT i_item_id AS item_id,
             CAST(SUM(CAST(sr_return_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS sr_item_qty
      FROM store_returns, item, date_dim
      WHERE sr_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq IN
                             (SELECT d_week_seq FROM date_dim
                              WHERE d_date IN (CAST('1998-01-02' AS DATE),
                                               CAST('1998-02-12' AS DATE),
                                               CAST('1998-03-05' AS DATE),
                                               CAST('1998-05-20' AS DATE),
                                               CAST('1998-07-07' AS DATE),
                                               CAST('1998-08-14' AS DATE),
                                               CAST('1998-09-22' AS DATE),
                                               CAST('1998-10-15' AS DATE),
                                               CAST('1998-11-10' AS DATE))))
        AND sr_returned_date_sk = d_date_sk
      GROUP BY i_item_id
    ),
    cr_items AS (
      SELECT i_item_id AS item_id,
             CAST(SUM(CAST(cr_return_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS cr_item_qty
      FROM catalog_returns, item, date_dim
      WHERE cr_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq IN
                             (SELECT d_week_seq FROM date_dim
                              WHERE d_date IN (CAST('1998-01-02' AS DATE),
                                               CAST('1998-02-12' AS DATE),
                                               CAST('1998-03-05' AS DATE),
                                               CAST('1998-05-20' AS DATE),
                                               CAST('1998-07-07' AS DATE),
                                               CAST('1998-08-14' AS DATE),
                                               CAST('1998-09-22' AS DATE),
                                               CAST('1998-10-15' AS DATE),
                                               CAST('1998-11-10' AS DATE))))
        AND cr_returned_date_sk = d_date_sk
      GROUP BY i_item_id
    ),
    wr_items AS (
      SELECT i_item_id AS item_id,
             CAST(SUM(CAST(wr_return_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS wr_item_qty
      FROM web_returns, item, date_dim
      WHERE wr_item_sk = i_item_sk
        AND d_date IN (SELECT d_date FROM date_dim
                       WHERE d_week_seq IN
                             (SELECT d_week_seq FROM date_dim
                              WHERE d_date IN (CAST('1998-01-02' AS DATE),
                                               CAST('1998-02-12' AS DATE),
                                               CAST('1998-03-05' AS DATE),
                                               CAST('1998-05-20' AS DATE),
                                               CAST('1998-07-07' AS DATE),
                                               CAST('1998-08-14' AS DATE),
                                               CAST('1998-09-22' AS DATE),
                                               CAST('1998-10-15' AS DATE),
                                               CAST('1998-11-10' AS DATE))))
        AND wr_returned_date_sk = d_date_sk
      GROUP BY i_item_id
    )
    SELECT sr_items.item_id,
           sr_item_qty,
           sr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0
               * 100 AS sr_dev,
           cr_item_qty,
           cr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0
               * 100 AS cr_dev,
           wr_item_qty,
           wr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0
               * 100 AS wr_dev,
           (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 AS average
    FROM sr_items, cr_items, wr_items
    WHERE sr_items.item_id = cr_items.item_id
      AND sr_items.item_id = wr_items.item_id
    ORDER BY sr_items.item_id, sr_item_qty
    LIMIT 100
    """,
    doc="""TPC-DS q83 (reference tpcds_sql/83.sql) executed: items
    returned in the weeks containing three anchor dates, compared
    across all three return channels (q58's shape on the RETURNS
    tables, including the reference's own quirky /3.0-of-share dev
    formula, kept verbatim).  The reference's three anchor dates grow
    to nine spread over 1998 (the derived catalog/web channels are
    quarter slices, so a three-week three-channel item intersection is
    empty at small SF by construction); all dates in-calendar;
    quantity sums decimal-exact then DOUBLE.""",
)

_register(
    "tpcds_q31",
    """
    , ss AS (
      SELECT ca_county, d_qoy, d_year,
             SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS store_sales
      FROM store_sales, date_dim, customer_address
      WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
      GROUP BY ca_county, d_qoy, d_year
    ),
    ws AS (
      SELECT ca_county, d_qoy, d_year,
             SUM(CAST(ws_ext_sales_price AS DECIMAL(38,6))) AS web_sales
      FROM web_sales, date_dim, customer_address
      WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
      GROUP BY ca_county, d_qoy, d_year
    )
    SELECT ss1.ca_county, ss1.d_year,
           CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
               AS web_q1_q2_increase,
           CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE)
               AS store_q1_q2_increase,
           CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
               AS web_q2_q3_increase,
           CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE)
               AS store_q2_q3_increase
    FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
    WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000
      AND ss1.ca_county = ss2.ca_county
      AND ss2.d_qoy = 2 AND ss2.d_year = 2000
      AND ss2.ca_county = ss3.ca_county
      AND ss3.d_qoy = 3 AND ss3.d_year = 2000
      AND ss1.ca_county = ws1.ca_county
      AND ws1.d_qoy = 1 AND ws1.d_year = 2000
      AND ws1.ca_county = ws2.ca_county
      AND ws2.d_qoy = 2 AND ws2.d_year = 2000
      AND ws1.ca_county = ws3.ca_county
      AND ws3.d_qoy = 3 AND ws3.d_year = 2000
      AND CASE WHEN ws1.web_sales > 0
               THEN CAST(ws2.web_sales AS DOUBLE)
                    / CAST(ws1.web_sales AS DOUBLE) ELSE NULL END
        > CASE WHEN ss1.store_sales > 0
               THEN CAST(ss2.store_sales AS DOUBLE)
                    / CAST(ss1.store_sales AS DOUBLE) ELSE NULL END
      AND CASE WHEN ws2.web_sales > 0
               THEN CAST(ws3.web_sales AS DOUBLE)
                    / CAST(ws2.web_sales AS DOUBLE) ELSE NULL END
        > CASE WHEN ss2.store_sales > 0
               THEN CAST(ss3.store_sales AS DOUBLE)
                    / CAST(ss2.store_sales AS DOUBLE) ELSE NULL END
    ORDER BY ss1.d_year
    """,
    doc="""TPC-DS q31 (reference tpcds_sql/31.sql) executed: counties
    where web sales grew faster than store sales in consecutive
    quarters — two per-county quarterly CTEs each consumed three
    times (6-way self-join).  Every constant verbatim (year 2000,
    quarters 1-3 in-calendar); sums decimal-exact, growth ratios
    compared in DOUBLE.  No LIMIT, so the bare ORDER BY is safe under
    the order-insensitive hash.""",
)

_register(
    "tpcds_q27",
    f"""
    SELECT i_item_id, s_state,
           CAST(grouping(s_state) AS INT) AS g_state,
           {_AVG.format(c='ss_quantity')}    AS agg1,
           {_AVG.format(c='ss_list_price')}  AS agg2,
           {_AVG.format(c='ss_coupon_amt')}  AS agg3,
           {_AVG.format(c='ss_sales_price')} AS agg4
    FROM store_sales, customer_demographics, date_dim, store, item
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_store_sk = s_store_sk
      AND ss_cdemo_sk = cd_demo_sk
      AND cd_gender = 'M'
      AND cd_marital_status = 'W'
      AND cd_education_status = 'College'
      AND d_year = 2000
      AND s_state IN ('MO','LA','GA','MI','SC','OH')
    GROUP BY ROLLUP (i_item_id, s_state)
    ORDER BY i_item_id ASC NULLS FIRST, s_state ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q27 (reference tpcds_sql/27.sql) executed: the q7
    demographic star under GROUP BY ROLLUP(item, state) with
    grouping(s_state) in the output.  ORDER BY spells NULLS FIRST
    explicitly — the rollup's NULL keys sort first on Spark (ASC
    default) but LAST on DuckDB, which would silently change the
    LIMIT cut.  d_year 2002 -> 2000; state IN-list verbatim (3 of 6
    live in the derived domain).""",
)

_register(
    "tpcds_q28",
    """
    SELECT * FROM
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b1_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b1_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b1_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 0 AND 5
         AND (ss_list_price BETWEEN 1000 AND 1000 + 1000
              OR ss_coupon_amt BETWEEN 0.00 AND 0.02
              OR ss_wholesale_cost BETWEEN 14 AND 14 + 20)) b1,
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b2_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b2_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b2_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 6 AND 10
         AND (ss_list_price BETWEEN 9000 AND 9000 + 1000
              OR ss_coupon_amt BETWEEN 0.02 AND 0.04
              OR ss_wholesale_cost BETWEEN 32 AND 32 + 20)) b2,
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b3_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b3_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b3_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 11 AND 15
         AND (ss_list_price BETWEEN 6000 AND 6000 + 1000
              OR ss_coupon_amt BETWEEN 0.04 AND 0.06
              OR ss_wholesale_cost BETWEEN 4 AND 4 + 20)) b3,
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b4_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b4_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b4_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 16 AND 20
         AND (ss_list_price BETWEEN 14000 AND 14000 + 1000
              OR ss_coupon_amt BETWEEN 0.06 AND 0.08
              OR ss_wholesale_cost BETWEEN 80 AND 80 + 20)) b4,
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b5_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b5_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b5_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 21 AND 25
         AND (ss_list_price BETWEEN 13000 AND 13000 + 1000
              OR ss_coupon_amt BETWEEN 0.08 AND 0.10
              OR ss_wholesale_cost BETWEEN 38 AND 38 + 20)) b5,
      (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(ss_list_price) AS b6_lp,
              CAST(COUNT(ss_list_price) AS BIGINT) AS b6_cnt,
              CAST(COUNT(DISTINCT ss_list_price) AS BIGINT) AS b6_cntd
       FROM store_sales
       WHERE ss_quantity BETWEEN 26 AND 30
         AND (ss_list_price BETWEEN 2000 AND 2000 + 1000
              OR ss_coupon_amt BETWEEN 0.01 AND 0.03
              OR ss_wholesale_cost BETWEEN 42 AND 42 + 20)) b6
    LIMIT 100
    """,
    doc="""TPC-DS q28 (reference tpcds_sql/28.sql) executed: six
    quantity-bucket scans of the bare fact (no joins at all — the
    benchmark's pure scan/aggregate stressor), each computing
    avg / count / count-distinct of list price under a 3-way OR band,
    cross-joined into one row.  Bands retarget to the derived value
    domains (list price ~900..105k, coupon = l_discount 0..0.1,
    per-unit wholesale ~5..630); bucket boundaries verbatim.""",
)

_register(
    "tpcds_q22",
    """
    SELECT i_product_name, i_brand, i_class, i_category,
           CAST(SUM(CAST(inv_quantity_on_hand AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(inv_quantity_on_hand) AS qoh
    FROM inventory, date_dim, item
    WHERE inv_date_sk = d_date_sk
      AND inv_item_sk = i_item_sk
      AND d_month_seq BETWEEN 1248 AND 1248 + 11
    GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)
    ORDER BY qoh ASC NULLS FIRST, i_product_name ASC NULLS FIRST,
             i_brand ASC NULLS FIRST, i_class ASC NULLS FIRST,
             i_category ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q22 (reference tpcds_sql/22.sql) executed: average
    inventory on hand over a 4-level item ROLLUP.  The avg spells
    exact-decimal-sum / count; ORDER BY gets explicit NULLS FIRST on
    every key (rollup NULLs + the Spark/DuckDB default-null-order
    divergence would otherwise change the LIMIT cut).  Month-seq
    1212 -> 1248.""",
)

_register(
    "tpcds_q21",
    """
    SELECT * FROM
      (SELECT w_warehouse_name, i_item_id,
              CAST(SUM(CASE WHEN CAST(d_date AS DATE)
                                 < CAST('1998-04-08' AS DATE)
                       THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
                  AS inv_before,
              CAST(SUM(CASE WHEN CAST(d_date AS DATE)
                                 >= CAST('1998-04-08' AS DATE)
                       THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
                  AS inv_after
       FROM inventory, warehouse, item, date_dim
       WHERE i_current_price BETWEEN 920 AND 930
         AND i_item_sk = inv_item_sk
         AND inv_warehouse_sk = w_warehouse_sk
         AND inv_date_sk = d_date_sk
         AND d_date BETWEEN CAST('1998-04-08' AS DATE) - INTERVAL 30 DAY
                        AND CAST('1998-04-08' AS DATE) + INTERVAL 30 DAY
       GROUP BY w_warehouse_name, i_item_id) x
    WHERE (CASE WHEN inv_before > 0
                THEN CAST(inv_after AS DOUBLE) / inv_before
                ELSE NULL END) BETWEEN 2.0/3.0 AND 3.0/2.0
    ORDER BY w_warehouse_name, i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q21 (reference tpcds_sql/21.sql) executed: per-
    warehouse inventory balance 30 days either side of one date, kept
    when the after/before ratio stays within [2/3, 3/2] (band
    verbatim).  The inventory grid gains its warehouse key; date
    '1998-04-08' verbatim; price band 0.99..1.49 -> 920..930 (derived
    price domain).""",
)

_register(
    "tpcds_q39",
    f"""
    , inv AS (
      SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
             stdev, mean,
             CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
      FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
                   CAST({_STDDEV.format(c='inv_quantity_on_hand')} AS DOUBLE)
                       AS stdev,
                   {_AVG.format(c='inv_quantity_on_hand')} AS mean
            FROM inventory, item, warehouse, date_dim
            WHERE inv_item_sk = i_item_sk
              AND inv_warehouse_sk = w_warehouse_sk
              AND inv_date_sk = d_date_sk
              AND d_year = 1998
            GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
      WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 0.4
    )
    SELECT CAST(inv1.w_warehouse_sk AS BIGINT) AS wsk1,
           CAST(inv1.i_item_sk AS BIGINT) AS isk1,
           CAST(inv1.d_moy AS BIGINT) AS moy1,
           inv1.mean AS mean1, inv1.cov AS cov1,
           CAST(inv2.w_warehouse_sk AS BIGINT) AS wsk2,
           CAST(inv2.i_item_sk AS BIGINT) AS isk2,
           CAST(inv2.d_moy AS BIGINT) AS moy2,
           inv2.mean AS mean2, inv2.cov AS cov2
    FROM inv inv1, inv inv2
    WHERE inv1.i_item_sk = inv2.i_item_sk
      AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      AND inv1.d_moy = 4
      AND inv2.d_moy = 4 + 1
    ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
             inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
    """,
    doc="""TPC-DS q39 (reference tpcds_sql/39.sql, first statement)
    executed: warehouse-item months whose inventory coefficient of
    variation stays high in consecutive months — stddev_samp from
    exact decimal moments (the q17 spelling), self-joined April-May.
    The cov threshold retargets 1 -> 0.4: the derived quantity grid is
    uniform-ish (cov ~0.6), so the verbatim >1 filter is empty by
    construction.  Output columns aliased wsk1/isk1/... so the
    self-join's duplicate names hash distinctly.""",
)


_register(
    "tpcds_q97",
    """
    , ssci AS (
      SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      GROUP BY ss_customer_sk, ss_item_sk
    ),
    csci AS (
      SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      FROM catalog_sales, date_dim
      WHERE cs_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
      GROUP BY cs_bill_customer_sk, cs_item_sk
    )
    SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(SUM(CASE WHEN ssci.customer_sk IS NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
    FROM ssci FULL OUTER JOIN csci
      ON (ssci.customer_sk = csci.customer_sk
          AND ssci.item_sk = csci.item_sk)
    LIMIT 100
    """,
    doc="""TPC-DS q97 (reference tpcds_sql/97.sql) executed: distinct
    customer-item purchase pairs FULL OUTER joined across the store and
    catalog channels, counted by exclusive/shared membership via the
    NULL-extension pattern.  Month-seq 1212 -> 1248.""",
)

_register(
    "tpcds_q9",
    f"""
    SELECT CASE WHEN (SELECT COUNT(*) FROM store_sales
                      WHERE ss_quantity BETWEEN 1 AND 20) > 409437
                THEN (SELECT {_AVG.format(c='ss_ext_tax')} FROM store_sales
                      WHERE ss_quantity BETWEEN 1 AND 20)
                ELSE (SELECT {_AVG.format(c='ss_net_paid')} FROM store_sales
                      WHERE ss_quantity BETWEEN 1 AND 20) END AS bucket1,
           CASE WHEN (SELECT COUNT(*) FROM store_sales
                      WHERE ss_quantity BETWEEN 21 AND 40) > 4595804
                THEN (SELECT {_AVG.format(c='ss_ext_tax')} FROM store_sales
                      WHERE ss_quantity BETWEEN 21 AND 40)
                ELSE (SELECT {_AVG.format(c='ss_net_paid')} FROM store_sales
                      WHERE ss_quantity BETWEEN 21 AND 40) END AS bucket2,
           CASE WHEN (SELECT COUNT(*) FROM store_sales
                      WHERE ss_quantity BETWEEN 41 AND 60) > 1333710
                THEN (SELECT {_AVG.format(c='ss_ext_tax')} FROM store_sales
                      WHERE ss_quantity BETWEEN 41 AND 60)
                ELSE (SELECT {_AVG.format(c='ss_net_paid')} FROM store_sales
                      WHERE ss_quantity BETWEEN 41 AND 60) END AS bucket3,
           CASE WHEN (SELECT COUNT(*) FROM store_sales
                      WHERE ss_quantity BETWEEN 61 AND 80) > 2361102
                THEN (SELECT {_AVG.format(c='ss_ext_tax')} FROM store_sales
                      WHERE ss_quantity BETWEEN 61 AND 80)
                ELSE (SELECT {_AVG.format(c='ss_net_paid')} FROM store_sales
                      WHERE ss_quantity BETWEEN 61 AND 80) END AS bucket4,
           CASE WHEN (SELECT COUNT(*) FROM store_sales
                      WHERE ss_quantity BETWEEN 81 AND 100) > 1517817
                THEN (SELECT {_AVG.format(c='ss_ext_tax')} FROM store_sales
                      WHERE ss_quantity BETWEEN 81 AND 100)
                ELSE (SELECT {_AVG.format(c='ss_net_paid')} FROM store_sales
                      WHERE ss_quantity BETWEEN 81 AND 100) END AS bucket5
    FROM reason
    WHERE r_reason_sk = 1
    """,
    doc="""TPC-DS q9 (reference tpcds_sql/9.sql) executed: five
    quantity-bucket CASE branches each choosing between two scalar
    aggregates by a count threshold (thresholds verbatim — at the test
    SFs every branch resolves to the ELSE side identically on both
    engines; the derived quantity domain 1..50 leaves buckets 4-5
    legitimately NULL-empty).  Averages spelled exact-decimal-sum /
    count; the single reason row anchors the one-row output exactly as
    the reference intends.""",
)

_register(
    "tpcds_q90",
    """
    SELECT CAST(amc AS DOUBLE) / NULLIF(CAST(pmc AS DOUBLE), 0)
               AS am_pm_ratio
    FROM (SELECT COUNT(*) AS amc
          FROM web_sales, household_demographics, time_dim, web_page
          WHERE ws_sold_time_sk = time_dim.t_time_sk
            AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
            AND ws_web_page_sk = web_page.wp_web_page_sk
            AND time_dim.t_hour BETWEEN 6 AND 6 + 1
            AND household_demographics.hd_dep_count = 8
            AND web_page.wp_char_count BETWEEN 5000 AND 5200) at_t,
         (SELECT COUNT(*) AS pmc
          FROM web_sales, household_demographics, time_dim, web_page
          WHERE ws_sold_time_sk = time_dim.t_time_sk
            AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
            AND ws_web_page_sk = web_page.wp_web_page_sk
            AND time_dim.t_hour BETWEEN 14 AND 14 + 1
            AND household_demographics.hd_dep_count = 8
            AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt
    ORDER BY am_pm_ratio
    LIMIT 100
    """,
    doc="""TPC-DS q90 (reference tpcds_sql/90.sql) executed: the web
    morning/afternoon order-count ratio for big households on long
    pages.  web_page is a generated 12-row dimension whose char-count
    grid intersects the verbatim 5000..5200 band; the web fact gains
    ship-household and page keys.  The DECIMAL(15,4) ratio cast becomes
    DOUBLE-over-exact-counts through NULLIF (zero afternoon count would
    raise under ANSI, yield inf in DuckDB — same divergence class as
    q59).  'at' is aliased at_t: it parses as a keyword on one engine
    and not the other.""",
)


_register(
    "tpcds_q16",
    """
    SELECT CAST(COUNT(DISTINCT cs_order_number) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(cs_ext_ship_cost AS DECIMAL(38,6))) AS DOUBLE)
               AS total_ship_cost,
           CAST(SUM(CAST(cs_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS total_net_profit
    FROM catalog_sales cs1, date_dim, customer_address, call_center
    WHERE d_date BETWEEN CAST('1999-04-01' AS DATE)
                     AND CAST('1999-04-01' AS DATE) + INTERVAL 60 DAY
      AND cs1.cs_ship_date_sk = d_date_sk
      AND cs1.cs_ship_addr_sk = ca_address_sk
      AND ca_state = 'GA'
      AND cs1.cs_call_center_sk = cc_call_center_sk
      AND cc_county IN ('Daviess County','Franklin Parish','Barrow County',
                        'Luce County','Fairfield County')
      AND EXISTS (SELECT * FROM catalog_sales cs2
                  WHERE cs1.cs_order_number = cs2.cs_order_number
                    AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
      AND NOT EXISTS (SELECT * FROM catalog_returns cr1
                      WHERE cs1.cs_order_number = cr1.cr_order_number)
    LIMIT 100
    """,
    doc="""TPC-DS q16 (reference tpcds_sql/16.sql) executed: catalog
    orders shipped from MULTIPLE warehouses with NO return — a
    same-fact EXISTS on order-number with warehouse inequality plus a
    NOT EXISTS anti-join against catalog_returns.  cc_county list
    verbatim (the generated call-center county domain IS that list);
    ca_state 'GA' and the 60-day 1999 window verbatim.  The quoted
    'order count' names become order_cnt/... (house rule); the bare
    ORDER BY on the single-row aggregate is dropped (no-op).""",
)

_register(
    "tpcds_q94",
    """
    SELECT CAST(COUNT(DISTINCT ws_order_number) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(ws_ext_ship_cost AS DECIMAL(38,6))) AS DOUBLE)
               AS total_ship_cost,
           CAST(SUM(CAST(ws_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS total_net_profit
    FROM web_sales ws1, date_dim, customer_address, web_site
    WHERE d_date BETWEEN CAST('1999-05-01' AS DATE)
                     AND CAST('1999-05-01' AS DATE) + INTERVAL 60 DAY
      AND ws1.ws_ship_date_sk = d_date_sk
      AND ws1.ws_ship_addr_sk = ca_address_sk
      AND ca_state = 'TX'
      AND ws1.ws_web_site_sk = web_site_sk
      AND web_company_name = 'pri'
      AND EXISTS (SELECT * FROM web_sales ws2
                  WHERE ws1.ws_order_number = ws2.ws_order_number
                    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      AND NOT EXISTS (SELECT * FROM web_returns wr1
                      WHERE ws1.ws_order_number = wr1.wr_order_number)
    LIMIT 100
    """,
    doc="""TPC-DS q94 (reference tpcds_sql/94.sql) executed: q16's web
    twin — multi-warehouse unreturned web orders for one site company
    ('pri' verbatim; the generated web_site alternates pri/able).
    ca_state 'TX' and the 60-day 1999 window verbatim.""",
)

_register(
    "tpcds_q95",
    """
    , ws_wh AS (
      SELECT ws1.ws_order_number, ws1.ws_warehouse_sk AS wh1,
             ws2.ws_warehouse_sk AS wh2
      FROM web_sales ws1, web_sales ws2
      WHERE ws1.ws_order_number = ws2.ws_order_number
        AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk
    )
    SELECT CAST(COUNT(DISTINCT ws_order_number) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(ws_ext_ship_cost AS DECIMAL(38,6))) AS DOUBLE)
               AS total_ship_cost,
           CAST(SUM(CAST(ws_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS total_net_profit
    FROM web_sales ws1, date_dim, customer_address, web_site
    WHERE d_date BETWEEN CAST('1999-05-01' AS DATE)
                     AND CAST('1999-05-01' AS DATE) + INTERVAL 60 DAY
      AND ws1.ws_ship_date_sk = d_date_sk
      AND ws1.ws_ship_addr_sk = ca_address_sk
      AND ca_state = 'GA'
      AND ws1.ws_web_site_sk = web_site_sk
      AND web_company_name = 'pri'
      AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
      AND ws1.ws_order_number IN (SELECT wr_order_number
                                  FROM web_returns, ws_wh
                                  WHERE wr_order_number = ws_wh.ws_order_number)
    LIMIT 100
    """,
    doc="""TPC-DS q95 (reference tpcds_sql/95.sql) executed: q94's
    RETURNED complement — multi-warehouse web orders that WERE
    returned, with the warehouse-pair CTE consumed by two IN
    subqueries (the second joining returns to the pair set).
    ca_state 'IL' -> 'GA' (derived domain); everything else
    verbatim.""",
)

_DEMOGRAPHIC_EXISTS = """
    SELECT {out}
    FROM customer c, customer_address ca, customer_demographics
    WHERE c.c_current_addr_sk = ca.ca_address_sk
      AND {geo}
      AND cd_demo_sk = c.c_current_cdemo_sk
      AND EXISTS (SELECT * FROM store_sales, date_dim
                  WHERE c.c_customer_sk = ss_customer_sk
                    AND ss_sold_date_sk = d_date_sk AND {win})
      AND ({neg} EXISTS (SELECT * FROM web_sales, date_dim
                   WHERE c.c_customer_sk = ws_bill_customer_sk
                     AND ws_sold_date_sk = d_date_sk AND {win})
           {op} {neg} EXISTS (SELECT * FROM catalog_sales, date_dim
                   WHERE c.c_customer_sk = cs_ship_customer_sk
                     AND cs_sold_date_sk = d_date_sk AND {win}))
    GROUP BY {keys}
    ORDER BY {keys}
    LIMIT 100
"""

_register(
    "tpcds_q69",
    _DEMOGRAPHIC_EXISTS.format(
        out="cd_gender, cd_marital_status, cd_education_status,"
            " CAST(COUNT(*) AS BIGINT) AS cnt1, cd_purchase_estimate,"
            " CAST(COUNT(*) AS BIGINT) AS cnt2, cd_credit_rating,"
            " CAST(COUNT(*) AS BIGINT) AS cnt3",
        geo="ca_state IN ('CA','GA','TX')",
        win="d_year = 1999 AND d_moy BETWEEN 1 AND 1+2",
        neg="NOT", op="AND",
        keys="cd_gender, cd_marital_status, cd_education_status,"
             " cd_purchase_estimate, cd_credit_rating",
    ),
    doc="""TPC-DS q69 (reference tpcds_sql/69.sql) executed: the
    demographic profile of customers who bought in stores but NOT on
    the web or by catalog in one quarter — EXISTS + two NOT EXISTS
    decorrelated to semi/anti joins.  customer gains its
    current-cdemo key and customer_demographics its purchase-estimate
    and credit-rating attributes; states ('CO','IL','MN') -> derived
    ('CA','GA','TX').""",
)

_register(
    "tpcds_q10",
    _DEMOGRAPHIC_EXISTS.format(
        out="cd_gender, cd_marital_status, cd_education_status,"
            " CAST(COUNT(*) AS BIGINT) AS cnt1, cd_purchase_estimate,"
            " CAST(COUNT(*) AS BIGINT) AS cnt2, cd_credit_rating,"
            " CAST(COUNT(*) AS BIGINT) AS cnt3, cd_dep_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt4, cd_dep_employed_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt5, cd_dep_college_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt6",
        geo="ca_county IN ('county_1','county_3','county_5',"
            "'county_7','county_9')",
        win="d_year = 2000 AND d_moy BETWEEN 4 AND 4+3",
        neg="", op="OR",
        keys="cd_gender, cd_marital_status, cd_education_status,"
             " cd_purchase_estimate, cd_credit_rating, cd_dep_count,"
             " cd_dep_employed_count, cd_dep_college_count",
    ),
    doc="""TPC-DS q10 (reference tpcds_sql/10.sql) executed: q69's OR
    twin — store buyers who ALSO bought on web OR catalog, with the
    full dependent-count demographic grouping.  County list retargets
    to the derived county_k domain; d_year 2002 -> 2000.""",
)

_register(
    "tpcds_q35",
    _DEMOGRAPHIC_EXISTS.format(
        out="ca_state, cd_gender, cd_marital_status, cd_dep_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt1,"
            " CAST(SUM(CAST(cd_dep_count AS DECIMAL(38,6))) AS DOUBLE)"
            "   / COUNT(cd_dep_count) AS avg_dep,"
            " CAST(MAX(cd_dep_count) AS INT) AS max_dep,"
            " CAST(SUM(cd_dep_count) AS BIGINT) AS sum_dep,"
            " cd_dep_employed_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt2,"
            " CAST(SUM(CAST(cd_dep_employed_count AS DECIMAL(38,6)))"
            "   AS DOUBLE) / COUNT(cd_dep_employed_count) AS avg_emp,"
            " CAST(MAX(cd_dep_employed_count) AS INT) AS max_emp,"
            " CAST(SUM(cd_dep_employed_count) AS BIGINT) AS sum_emp,"
            " cd_dep_college_count,"
            " CAST(COUNT(*) AS BIGINT) AS cnt3,"
            " CAST(SUM(CAST(cd_dep_college_count AS DECIMAL(38,6)))"
            "   AS DOUBLE) / COUNT(cd_dep_college_count) AS avg_col,"
            " CAST(MAX(cd_dep_college_count) AS INT) AS max_col,"
            " CAST(SUM(cd_dep_college_count) AS BIGINT) AS sum_col",
        geo="1 = 1",
        win="d_year = 1999 AND d_qoy < 4",
        neg="", op="OR",
        keys="ca_state, cd_gender, cd_marital_status, cd_dep_count,"
             " cd_dep_employed_count, cd_dep_college_count",
    ),
    doc="""TPC-DS q35 (reference tpcds_sql/35.sql) executed: q10's
    statistical sibling — count/avg/max/sum of the dependent counts per
    state and demographic cell, same EXISTS/OR-EXISTS channel logic
    (no geographic filter in the reference; 1=1 stands in for its
    absent predicate).  All date constants verbatim; avgs
    exact-decimal, integer sums CAST BIGINT.""",
)

_register(
    "tpcds_q18",
    f"""
    SELECT i_item_id, ca_country, ca_state, ca_county,
           {_AVG.format(c='cs_quantity')}    AS agg1,
           {_AVG.format(c='cs_list_price')}  AS agg2,
           {_AVG.format(c='cs_coupon_amt')}  AS agg3,
           {_AVG.format(c='cs_sales_price')} AS agg4,
           {_AVG.format(c='cs_net_profit')}  AS agg5,
           {_AVG.format(c='c_birth_year')}   AS agg6,
           {_AVG.format(c='cd1.cd_dep_count')} AS agg7
    FROM catalog_sales, customer_demographics cd1,
         customer_demographics cd2, customer, customer_address,
         date_dim, item
    WHERE cs_sold_date_sk = d_date_sk
      AND cs_item_sk = i_item_sk
      AND cs_bill_cdemo_sk = cd1.cd_demo_sk
      AND cs_bill_customer_sk = c_customer_sk
      AND cd1.cd_gender = 'M'
      AND cd1.cd_education_status = 'College'
      AND c_current_cdemo_sk = cd2.cd_demo_sk
      AND c_current_addr_sk = ca_address_sk
      AND c_birth_month IN (9,5,12,4,1,10)
      AND d_year = 2001
      AND ca_state IN ('NY','WA','AL','NC','OK','FL','TN')
    GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
    ORDER BY ca_country ASC NULLS FIRST, ca_state ASC NULLS FIRST,
             ca_county ASC NULLS FIRST, i_item_id ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q18 (reference tpcds_sql/18.sql) executed: catalog
    demographic averages over a 4-level geography ROLLUP with TWO
    customer_demographics roles (bill demo filtered, current demo as a
    pure fan join — kept verbatim).  Birth months and d_year 2001
    verbatim; state list folded into the derived domain keeping three
    live values; every avg exact-decimal; explicit NULLS FIRST
    ordering (rollup-NULL cut rule).""",
)


_register(
    "tpcds_q46",
    """
    SELECT c_last_name, c_first_name, ca_city, bought_city,
           ss_ticket_number, amt, profit
    FROM
      (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
              CAST(SUM(CAST(ss_coupon_amt AS DECIMAL(38,6))) AS DOUBLE)
                  AS amt,
              CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
                  AS profit
       FROM store_sales, date_dim, store, household_demographics,
            customer_address
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_store_sk = store.s_store_sk
         AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
         AND store_sales.ss_addr_sk = customer_address.ca_address_sk
         AND (household_demographics.hd_dep_count = 6
              OR household_demographics.hd_vehicle_count = 3)
         AND date_dim.d_dow IN (6, 0)
         AND date_dim.d_year IN (1999, 1999+1, 1999+2)
         AND store.s_city IN ('Oakland','Riverside','Union','Salem',
                              'Greenwood')
       GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
      customer, customer_address current_addr
    WHERE ss_customer_sk = c_customer_sk
      AND customer.c_current_addr_sk = current_addr.ca_address_sk
      AND current_addr.ca_city <> bought_city
    ORDER BY c_last_name, c_first_name, ca_city, bought_city,
             ss_ticket_number
    LIMIT 100
    """,
    doc="""TPC-DS q46 (reference tpcds_sql/46.sql) executed: weekend
    ticket baskets in selected cities for big/motorized households,
    re-joined to each customer's CURRENT address and kept when they
    shopped outside their home city (customer_address in two roles).
    Every constant verbatim — the city list's first two values live in
    the derived domain, d_dow in (6,0) matches the derived
    days-since-epoch dow encoding, years 1999-2001 in-calendar.""",
)

_register(
    "tpcds_q84",
    """
    SELECT c_customer_id AS customer_id,
           coalesce(c_last_name, '') || ', ' || coalesce(c_first_name, '')
               AS customername
    FROM customer, customer_address, customer_demographics,
         household_demographics, income_band, store_returns
    WHERE ca_city = 'city_7'
      AND c_current_addr_sk = ca_address_sk
      AND ib_lower_bound >= 32287
      AND ib_upper_bound <= 32287 + 50000
      AND ib_income_band_sk = hd_income_band_sk
      AND cd_demo_sk = c_current_cdemo_sk
      AND hd_demo_sk = c_current_hdemo_sk
      AND sr_cdemo_sk = cd_demo_sk
    ORDER BY c_customer_id
    LIMIT 100
    """,
    doc="""TPC-DS q84 (reference tpcds_sql/84.sql) executed: customers
    in one city within an income band who returned something — the
    5-dimension customer-profile chain (address -> current demo ->
    household -> income_band) semi-joined through store_returns'
    cdemo key.  income_band is a generated 20-band dimension whose
    10k-wide bands intersect the verbatim [32287, 82287] window;
    'Hopewell' -> 'city_7' (derived city domain).""",
)

_register(
    "tpcds_q91",
    """
    SELECT cc_call_center_id AS call_center, cc_name AS call_center_name,
           cc_manager AS manager,
           CAST(SUM(CAST(cr_net_loss AS DECIMAL(38,6))) AS DOUBLE)
               AS returns_loss
    FROM call_center, catalog_returns, date_dim, customer,
         customer_address, customer_demographics, household_demographics
    WHERE cr_call_center_sk = cc_call_center_sk
      AND cr_returned_date_sk = d_date_sk
      AND cr_returning_customer_sk = c_customer_sk
      AND cd_demo_sk = c_current_cdemo_sk
      AND hd_demo_sk = c_current_hdemo_sk
      AND ca_address_sk = c_current_addr_sk
      AND d_year = 1999
      AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
        OR (cd_marital_status = 'W'
            AND cd_education_status = 'Advanced Degree'))
      AND hd_buy_potential LIKE '0-500%'
      AND ca_gmt_offset = -7
    GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status,
             cd_education_status
    ORDER BY returns_loss DESC
    """,
    doc="""TPC-DS q91 (reference tpcds_sql/91.sql) executed: call-center
    return losses for low-budget demographic slices — the
    catalog_returns fact joined through the customer's CURRENT
    demographics (not the transaction's).  call_center gains id and
    manager attributes; demographic pairs, the LIKE band and GMT -7
    verbatim.  One retarget: the reference's November-1999 month filter
    widens to all of 1999 — the triple current-demographic filter
    leaves a sub-row expectation in a single month at the test scale
    factors, and a structurally-empty result would make the oracle a
    schema-only check.""",
)

_register(
    "tpcds_q40",
    """
    SELECT w_state, i_item_id,
           CAST(SUM(CASE WHEN CAST(d_date AS DATE)
                              < CAST('1998-04-08' AS DATE)
                    THEN CAST(cs_sales_price - coalesce(cr_refunded_cash, 0)
                              AS DECIMAL(38,6))
                    ELSE 0 END) AS DOUBLE) AS sales_before,
           CAST(SUM(CASE WHEN CAST(d_date AS DATE)
                              >= CAST('1998-04-08' AS DATE)
                    THEN CAST(cs_sales_price - coalesce(cr_refunded_cash, 0)
                              AS DECIMAL(38,6))
                    ELSE 0 END) AS DOUBLE) AS sales_after
    FROM catalog_sales
    LEFT OUTER JOIN catalog_returns
      ON (cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk),
         warehouse, item, date_dim
    WHERE i_current_price BETWEEN 920 AND 935
      AND i_item_sk = cs_item_sk
      AND cs_warehouse_sk = w_warehouse_sk
      AND cs_sold_date_sk = d_date_sk
      AND d_date BETWEEN CAST('1998-04-08' AS DATE) - INTERVAL 30 DAY
                     AND CAST('1998-04-08' AS DATE) + INTERVAL 30 DAY
    GROUP BY w_state, i_item_id
    ORDER BY w_state, i_item_id
    LIMIT 100
    """,
    doc="""TPC-DS q40 (reference tpcds_sql/40.sql) executed: catalog
    net sales (minus refunds via a LEFT OUTER returns join) per
    warehouse state, 30 days either side of one date.  warehouse gains
    w_state; catalog_returns gains refunded cash; date verbatim, price
    band 0.99..1.49 -> 920..935 (derived domain).""",
)

_register(
    "tpcds_q76",
    """
    SELECT channel, col_name, d_year, d_qoy, i_category,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           CAST(SUM(CAST(ext_sales_price AS DECIMAL(38,6))) AS DOUBLE)
               AS sales_amt
    FROM (
      SELECT 'store' AS channel, 'ss_addr_sk' AS col_name, d_year, d_qoy,
             i_category, ss_ext_sales_price AS ext_sales_price
      FROM store_sales, item, date_dim
      WHERE ss_addr_sk IS NULL
        AND ss_sold_date_sk = d_date_sk
        AND ss_item_sk = i_item_sk
      UNION ALL
      SELECT 'web', 'ws_web_page_sk', d_year, d_qoy, i_category,
             ws_ext_sales_price
      FROM web_sales, item, date_dim
      WHERE ws_web_page_sk IS NULL
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk = i_item_sk
      UNION ALL
      SELECT 'catalog', 'cs_warehouse_sk', d_year, d_qoy, i_category,
             cs_ext_sales_price
      FROM catalog_sales, item, date_dim
      WHERE cs_warehouse_sk IS NULL
        AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk = i_item_sk) foo
    GROUP BY channel, col_name, d_year, d_qoy, i_category
    ORDER BY channel, col_name, d_year, d_qoy, i_category
    LIMIT 100
    """,
    doc="""TPC-DS q76 (reference tpcds_sql/76.sql) executed VERBATIM:
    sales rows with MISSING dimension keys per channel (address for
    store, page for web, warehouse for catalog), UNION ALLed and
    profiled by quarter/category.  The derivation now leaves a small
    deterministic fraction of exactly these three keys NULL (mod-37/
    41/43 row hashes) so the missing-key population is real — the
    NULL-extension semantics every inner join in the suite must then
    honor (those rows silently drop from the q13/q48 geography slices
    etc., identically on both engines).""",
)

_register(
    "tpcds_q85",
    """
    SELECT substr(r_reason_desc, 1, 20) AS reason_prefix,
           CAST(SUM(CAST(ws_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(ws_quantity) AS avg_qty,
           CAST(SUM(CAST(wr_refunded_cash AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(wr_refunded_cash) AS avg_refunded,
           CAST(SUM(CAST(wr_fee AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(wr_fee) AS avg_fee
    FROM web_sales, web_returns, web_page, customer_demographics cd1,
         customer_demographics cd2, customer_address, date_dim, reason
    WHERE ws_web_page_sk = wp_web_page_sk
      AND ws_item_sk = wr_item_sk
      AND ws_order_number = wr_order_number
      AND ws_sold_date_sk = d_date_sk AND d_year = 1998
      AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
      AND cd2.cd_demo_sk = wr_returning_cdemo_sk
      AND ca_address_sk = wr_refunded_addr_sk
      AND r_reason_sk = wr_reason_sk
      AND ((cd1.cd_marital_status = 'M'
            AND cd1.cd_marital_status = cd2.cd_marital_status
            AND cd1.cd_education_status = '4 yr Degree'
            AND cd1.cd_education_status = cd2.cd_education_status
            AND ws_sales_price BETWEEN 0.05 AND 0.08)
        OR (cd1.cd_marital_status = 'D'
            AND cd1.cd_marital_status = cd2.cd_marital_status
            AND cd1.cd_education_status = 'Primary'
            AND cd1.cd_education_status = cd2.cd_education_status
            AND ws_sales_price BETWEEN 0.01 AND 0.04)
        OR (cd1.cd_marital_status = 'U'
            AND cd1.cd_marital_status = cd2.cd_marital_status
            AND cd1.cd_education_status = 'Advanced Degree'
            AND cd1.cd_education_status = cd2.cd_education_status
            AND ws_sales_price BETWEEN 0.03 AND 0.06))
      AND ((ca_country = 'United States'
            AND ca_state IN ('CA', 'GA', 'NY')
            AND ws_net_profit BETWEEN 1000 AND 2000)
        OR (ca_country = 'United States'
            AND ca_state IN ('TX', 'OH', 'WA')
            AND ws_net_profit BETWEEN 1500 AND 3000)
        OR (ca_country = 'United States'
            AND ca_state IN ('FL', 'NY', 'CA')
            AND ws_net_profit BETWEEN 1200 AND 2500))
    GROUP BY r_reason_desc
    ORDER BY reason_prefix, avg_qty, avg_refunded, avg_fee
    LIMIT 100
    """,
    doc="""TPC-DS q85 (reference tpcds_sql/85.sql) executed: web return
    reasons for demographic/geographic OR-slices where the REFUNDED and
    RETURNING parties share demographics — customer_demographics in two
    correlated roles (cd1 = cd2 equality inside each OR branch, kept
    verbatim).  web_returns gains refunded-cash/fee/cdemo/addr keys;
    sales-price and net-profit bands scaled into the derived domains
    (the q13 rule); marital/education pairs verbatim.""",
)


_register(
    "tpcds_q44",
    f"""
    SELECT asceding.rnk,
           i1.i_product_name AS best_performing,
           i2.i_product_name AS worst_performing
    FROM
      (SELECT * FROM
        (SELECT item_sk, CAST(rank() OVER (ORDER BY rank_col ASC) AS BIGINT)
                    AS rnk
         FROM (SELECT ss_item_sk AS item_sk,
                      {_AVG.format(c='ss_net_profit')} AS rank_col
               FROM store_sales ss1
               WHERE ss_store_sk = 4
               GROUP BY ss_item_sk
               HAVING {_AVG.format(c='ss_net_profit')} > 0.9 *
                      (SELECT {_AVG.format(c='ss_net_profit')} AS rank_col
                       FROM store_sales
                       WHERE ss_store_sk = 4 AND ss_hdemo_sk IS NULL
                       GROUP BY ss_store_sk)) v1) v11
       WHERE rnk < 11) asceding,
      (SELECT * FROM
        (SELECT item_sk, CAST(rank() OVER (ORDER BY rank_col DESC) AS BIGINT)
                    AS rnk
         FROM (SELECT ss_item_sk AS item_sk,
                      {_AVG.format(c='ss_net_profit')} AS rank_col
               FROM store_sales ss1
               WHERE ss_store_sk = 4
               GROUP BY ss_item_sk
               HAVING {_AVG.format(c='ss_net_profit')} > 0.9 *
                      (SELECT {_AVG.format(c='ss_net_profit')} AS rank_col
                       FROM store_sales
                       WHERE ss_store_sk = 4 AND ss_hdemo_sk IS NULL
                       GROUP BY ss_store_sk)) v2) v21
       WHERE rnk < 11) descending,
      item i1, item i2
    WHERE asceding.rnk = descending.rnk
      AND i1.i_item_sk = asceding.item_sk
      AND i2.i_item_sk = descending.item_sk
    ORDER BY asceding.rnk
    LIMIT 100
    """,
    doc="""TPC-DS q44 (reference tpcds_sql/44.sql) executed: best and
    worst items by average profit in one store, ranked ascending and
    descending and zipped by rank.  The HAVING threshold is the
    reference's own odd baseline — the store's average over rows with
    a MISSING household key, real since the derivation carries NULL
    hdemo fractions.  ss_store_sk 50 -> 4 (derived 10-store domain);
    averages exact-decimal; rank CAST BIGINT both engines.  Scale: the
    rnk < 11 filter triggers Spark's WindowGroupLimit inference — each
    partition forwards only its local top-10 into the SinglePartition
    rank exchange (pinned by
    test_no_unguarded_single_partition_window), so the global window
    sees <= 10 x partitions rows, never the item-grain aggregate.""",
)

_register(
    "tpcds_q51",
    """
    , web_v1 AS (
      SELECT ws_item_sk AS item_sk, d_date,
             SUM(SUM(CAST(ws_sales_price AS DECIMAL(38,6)))) OVER
                 (PARTITION BY ws_item_sk ORDER BY d_date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cume_sales
      FROM web_sales, date_dim
      WHERE ws_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
        AND ws_item_sk IS NOT NULL
      GROUP BY ws_item_sk, d_date
    ),
    store_v1 AS (
      SELECT ss_item_sk AS item_sk, d_date,
             SUM(SUM(CAST(ss_sales_price AS DECIMAL(38,6)))) OVER
                 (PARTITION BY ss_item_sk ORDER BY d_date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cume_sales
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1248 AND 1248 + 11
        AND ss_item_sk IS NOT NULL
      GROUP BY ss_item_sk, d_date
    )
    SELECT item_sk, d_date,
           CAST(web_sales AS DOUBLE) AS web_sales,
           CAST(store_sales AS DOUBLE) AS store_sales,
           CAST(web_cumulative AS DOUBLE) AS web_cumulative,
           CAST(store_cumulative AS DOUBLE) AS store_cumulative
    FROM (SELECT item_sk, d_date, web_sales, store_sales,
                 MAX(web_sales) OVER
                     (PARTITION BY item_sk ORDER BY d_date
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS web_cumulative,
                 MAX(store_sales) OVER
                     (PARTITION BY item_sk ORDER BY d_date
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS store_cumulative
          FROM (SELECT CASE WHEN web.item_sk IS NOT NULL
                            THEN web.item_sk ELSE store.item_sk END
                           AS item_sk,
                       CASE WHEN web.d_date IS NOT NULL
                            THEN web.d_date ELSE store.d_date END
                           AS d_date,
                       web.cume_sales AS web_sales,
                       store.cume_sales AS store_sales
                FROM web_v1 web FULL OUTER JOIN store_v1 store
                  ON (web.item_sk = store.item_sk
                      AND web.d_date = store.d_date)) x) y
    WHERE web_cumulative * 5 > store_cumulative
    ORDER BY item_sk, d_date
    LIMIT 100
    """,
    doc="""TPC-DS q51 (reference tpcds_sql/51.sql) executed: items whose
    cumulative web revenue overtakes their cumulative store revenue —
    per-channel running sums FULL OUTER joined by day, then running
    MAX to carry each channel's last seen cumulative across the other
    channel's missing days.  All windows partition by item (no
    single-partition hazard); sums stay DECIMAL through both window
    layers and render DOUBLE only at the output.  Month-seq 1212 ->
    1248; the crossover filter retargets to 5x web > store — the
    derived web channel is a strict quarter-slice of the store fact,
    so web_cumulative > store_cumulative is empty by construction.
    r13: both channels' d_month_seq 1248..1259 window (calendar 1996)
    pushed as the equivalent o_orderdate window below the fact base
    joins (same injectivity argument as q67).  A/B at sf0.1:
    1.19 -> 1.13 s min / 1.41 -> 1.29 med, rows identical.""",
    cte_where={
        "store_sales": "o_orderdate BETWEEN DATE '1996-01-01' "
                       "AND DATE '1996-12-31'",
        "web_sales": "o_orderdate BETWEEN DATE '1996-01-01' "
                     "AND DATE '1996-12-31'",
    },
)

_register(
    "tpcds_q70",
    """
    SELECT CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS total_sum,
           s_state, s_county,
           CAST(grouping(s_state) + grouping(s_county) AS INT)
               AS lochierarchy,
           CAST(rank() OVER (
               PARTITION BY grouping(s_state) + grouping(s_county),
                   CASE WHEN grouping(s_county) = 0 THEN s_state END
               ORDER BY SUM(CAST(ss_net_profit AS DECIMAL(38,6))) DESC)
               AS BIGINT) AS rank_within_parent
    FROM store_sales, date_dim d1, store
    WHERE d1.d_month_seq BETWEEN 1248 AND 1248 + 11
      AND d1.d_date_sk = ss_sold_date_sk
      AND s_store_sk = ss_store_sk
      AND s_state IN
          (SELECT s_state
           FROM (SELECT s_state,
                        rank() OVER (PARTITION BY s_state
                                     ORDER BY SUM(CAST(ss_net_profit
                                                  AS DECIMAL(38,6))) DESC)
                            AS ranking
                 FROM store_sales, store, date_dim
                 WHERE d_month_seq BETWEEN 1248 AND 1248 + 11
                   AND d_date_sk = ss_sold_date_sk
                   AND s_store_sk = ss_store_sk
                 GROUP BY s_state) tmp1
           WHERE ranking <= 5)
    GROUP BY ROLLUP(s_state, s_county)
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN s_state END ASC NULLS FIRST,
             rank_within_parent
    LIMIT 100
    """,
    doc="""TPC-DS q70 (reference tpcds_sql/70.sql) executed: the q36
    grouping-rank shape over store geography, gated by a top-5-states
    IN-subquery that itself ranks with a window over an aggregate.
    Month-seq 1212 -> 1248; rank over the exact DECIMAL sum (ordering
    on the exact value, not its double rendering); explicit NULLS
    FIRST on the rollup-NULL order key.""",
)

# q67 body (oracle + equivalence baseline) and its Spark-side respelling.
# The inner aggregate is replaced by a TWO-PHASE rollup for execution:
# finest-grain GROUP BY first, then ROLLUP over the partial sums.  Every
# rollup level is a coarsening of the 8-column finest grain and DECIMAL
# addition is exact and associative, so SUM(ps) per grouping set equals the
# inline SUM — rows identical (pinned at 2 SFs in test_plans.py; measured
# r13 interleaved A/B at sf0.1: inline 2.59 s -> two-phase 1.79 s min).
# At 100 TB the win is the same §2.3 story: Expand(9x) runs over the
# compacted finest-grain groups, not over every fact row, so the map-side
# hash aggregate processes ~9x fewer rows.
_Q67_INNER = """(SELECT i_category, i_class, i_brand, i_product_name, d_year,
                    d_qoy, d_moy, s_store_id,
                    SUM(CAST(coalesce(ss_sales_price * ss_quantity, 0)
                             AS DECIMAL(38,6))) AS sumsales
             FROM store_sales, date_dim, store, item
             WHERE ss_sold_date_sk = d_date_sk
               AND ss_item_sk = i_item_sk
               AND ss_store_sk = s_store_sk
               AND d_month_seq BETWEEN 1248 AND 1248 + 11
             GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name,
                             d_year, d_qoy, d_moy, s_store_id)) dw1"""

_Q67_INNER_TWOPHASE = """(SELECT i_category, i_class, i_brand,
                    i_product_name, d_year, d_qoy, d_moy, s_store_id,
                    SUM(ps) AS sumsales
             FROM (SELECT i_category, i_class, i_brand, i_product_name,
                          d_year, d_qoy, d_moy, s_store_id,
                          SUM(CAST(coalesce(ss_sales_price * ss_quantity, 0)
                                   AS DECIMAL(38,6))) AS ps
                   FROM store_sales, date_dim, store, item
                   WHERE ss_sold_date_sk = d_date_sk
                     AND ss_item_sk = i_item_sk
                     AND ss_store_sk = s_store_sk
                     AND d_month_seq BETWEEN 1248 AND 1248 + 11
                   GROUP BY i_category, i_class, i_brand, i_product_name,
                            d_year, d_qoy, d_moy, s_store_id) base
             GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name,
                             d_year, d_qoy, d_moy, s_store_id)) dw1"""

_Q67_BODY = f"""
    SELECT * FROM
      (SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
              d_moy, s_store_id,
              CAST(sumsales AS DOUBLE) AS sumsales,
              CAST(rank() OVER (PARTITION BY i_category
                                ORDER BY sumsales DESC) AS BIGINT) AS rk
       FROM {_Q67_INNER}) dw2
    WHERE rk <= 100
    ORDER BY i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
             i_brand ASC NULLS FIRST, i_product_name ASC NULLS FIRST,
             d_year ASC NULLS FIRST, d_qoy ASC NULLS FIRST,
             d_moy ASC NULLS FIRST, s_store_id ASC NULLS FIRST,
             sumsales, rk
    LIMIT 100
    """

_register(
    "tpcds_q67",
    _Q67_BODY,
    doc="""TPC-DS q67 (reference tpcds_sql/67.sql) executed: top-100
    revenue rows per category over an EIGHT-level rollup — the rank
    window runs over the rollup output itself (partition boundaries
    include the all-NULL super-aggregate rows).  Rank orders by the
    exact DECIMAL sum; the LIMIT's ORDER BY spells NULLS FIRST on
    every rollup key (cut rule); month-seq 1212 -> 1248.
    Spark-side execution (r13): two-phase rollup + the o_orderdate
    window pushed below the fact base join (equivalence arguments at
    the spelling definitions above and in _pruned_prelude).""",
    spark_body=_Q67_BODY.replace(_Q67_INNER, _Q67_INNER_TWOPHASE),
    # d_month_seq BETWEEN 1248 AND 1259 == calendar months 1996-01..
    # 1996-12 (d_month_seq = 1200 + (year-1992)*12 + month-1), and
    # ss_sold_date_sk = datediff(o_orderdate,'1992-01-01') + 2450000 =
    # d_date_sk forces o_orderdate = d_date — so the 1996 o_orderdate
    # window keeps exactly the fact rows the d_month_seq join keeps,
    # now pruned BEFORE the lineitem⋈orders pass (r13 A/B at sf0.1:
    # with two-phase, min 1.79 -> 1.37 s; rows identical all cycles).
    cte_where={"store_sales": "o_orderdate BETWEEN DATE '1996-01-01' "
                              "AND DATE '1996-12-31'"},
)


def _q49_in(alias: str, fact: str, rtbl: str, p: str, rp: str,
            amt: str = "return_amt") -> str:
    """Per-item return ratios for one q49 channel (reference
    tpcds_sql/49.sql inner aggregate)."""
    return f"""
    in_{alias} AS (
      SELECT f.{p}_item_sk AS item,
             CAST(SUM(CAST(coalesce(r.{rp}_return_quantity, 0)
                           AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(coalesce(f.{p}_quantity, 0)
                                 AS DECIMAL(38,6))) AS DOUBLE)
                 AS return_ratio,
             CAST(SUM(CAST(coalesce(r.{rp}_{amt}, 0)
                           AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CAST(coalesce(f.{p}_net_paid, 0)
                                 AS DECIMAL(38,6))) AS DOUBLE)
                 AS currency_ratio
      FROM {fact} f LEFT OUTER JOIN {rtbl} r
        ON (f.{p}_order_number = r.{rp}_order_number
            AND f.{p}_item_sk = r.{rp}_item_sk), date_dim
      WHERE r.{rp}_{amt} > 1000
        AND f.{p}_net_profit > 1
        AND f.{p}_net_paid > 0
        AND f.{p}_quantity > 0
        AND {p}_sold_date_sk = d_date_sk
        AND d_year = 2000
        AND d_moy = 12
      GROUP BY f.{p}_item_sk
    )"""


def _q49_channel(alias: str) -> str:
    """One q49 channel leg, scale-safe: the reference ranks every
    per-item row twice in ONE partition (rank() OVER (ORDER BY ...)
    with no PARTITION BY) and keeps rank<=10 on either metric.  The OR
    of two rank filters defeats Spark's WindowGroupLimit inference, so
    the verbatim text would move the whole per-item aggregate (grows
    with item count) into a single task at scale.  Equivalent two-phase
    construction: (1) each metric's top-10 via its own rank branch —
    the single-metric rank<=10 filter DOES trigger WindowGroupLimit, so
    every partition forwards at most 10 rows; (2) the <=20 UNIONed
    candidates broadcast against the channel aggregate and each exact
    rank is recovered as 1 + count(strictly smaller), the definition of
    rank() — ties and all.  Output rows and values are identical to the
    reference text."""
    return f"""
    SELECT '{alias}' AS channel, cand.item, cand.return_ratio,
           CAST(1 + SUM(CASE WHEN x.return_ratio < cand.return_ratio
                        THEN 1 ELSE 0 END) AS BIGINT) AS return_rank,
           CAST(1 + SUM(CASE WHEN x.currency_ratio < cand.currency_ratio
                        THEN 1 ELSE 0 END) AS BIGINT) AS currency_rank
    FROM (
      SELECT item, return_ratio, currency_ratio FROM (
        SELECT item, return_ratio, currency_ratio,
               rank() OVER (ORDER BY return_ratio) AS rk
        FROM in_{alias}) t1 WHERE rk <= 10
      UNION
      SELECT item, return_ratio, currency_ratio FROM (
        SELECT item, return_ratio, currency_ratio,
               rank() OVER (ORDER BY currency_ratio) AS rk
        FROM in_{alias}) t2 WHERE rk <= 10
    ) cand, in_{alias} x
    GROUP BY cand.item, cand.return_ratio, cand.currency_ratio
    HAVING 1 + SUM(CASE WHEN x.return_ratio < cand.return_ratio
                   THEN 1 ELSE 0 END) <= 10
        OR 1 + SUM(CASE WHEN x.currency_ratio < cand.currency_ratio
                   THEN 1 ELSE 0 END) <= 10
    """


_register_shared_fact(
    "tpcds_q49",
    ", "
    + _q49_in("web", "web_sales", "web_returns", "ws", "wr").lstrip()
    + ","
    + _q49_in("ctlg", "catalog_sales", "catalog_returns", "cs", "cr",
              amt="return_amount")
    + ","
    + _q49_in("store", "store_sales_k", "store_returns", "ssk", "sr")
    .replace("FROM store_sales_k f", "FROM (SELECT ss_item_sk AS ssk_item_sk,"
             " ss_ticket_number AS ssk_order_number,"
             " ss_quantity AS ssk_quantity, ss_net_paid AS ssk_net_paid,"
             " ss_net_profit AS ssk_net_profit,"
             " ss_sold_date_sk AS ssk_sold_date_sk FROM store_sales) f")
    .replace("sr_order_number", "sr_ticket_number")
    + _q49_channel("web")
    + " UNION "
    + _q49_channel("ctlg").replace("'ctlg' AS channel",
                                   "'catalog' AS channel")
    + " UNION "
    + _q49_channel("store")
    + """
    ORDER BY 1, 4, 5, 2
    LIMIT 100
    """,
    doc="""TPC-DS q49 (reference tpcds_sql/49.sql) executed: worst
    return ratios (by quantity and by currency) per channel, ranked
    twice and UNION-deduplicated across web/catalog/store.  The
    reference's left-join-then-filter (the return predicate
    re-inner-joins) is kept verbatim; the store leg aliases its
    ticket-number as the order key through a projected sub-select so
    the three channels share one text template.  The unpartitioned
    double-rank is restructured into the two-phase top-k + count-rank
    construction (see _q49_channel: WindowGroupLimit-eligible rank
    branches, then rank = 1 + count(smaller) over broadcast
    candidates) — row-identical to the reference, no fact-sized
    SinglePartition window.  DECIMAL(15,4) ratio casts become
    exact-decimal-sum ratios in DOUBLE; the wr_return_amt > 10000
    threshold retargets to > 1000 (the derived 0.1x-extendedprice
    refunds cap near 10k, selecting nothing); ordinal ORDER BY
    1,4,5,2 verbatim.""",
    facts=["store_sales", "web_sales", "catalog_sales",
           "store_returns", "web_returns", "catalog_returns"],
    # Each in_* leg constrains its SALES side with {p}_sold_date_sk =
    # d_date_sk AND d_year = 2000 AND d_moy = 12 (December 2000 lies in
    # date_dim's domain; the sk mapping is injective in o_orderdate), so
    # sales rows outside that month never join.  The RETURNS sides carry
    # no date predicate of their own (they are keyed to the sales rows by
    # order/item), so they stay unfiltered.
    fact_where={
        "store_sales": "o_orderdate >= DATE '2000-12-01'"
                       " AND o_orderdate <= DATE '2000-12-31'",
        "web_sales": "o_orderdate >= DATE '2000-12-01'"
                     " AND o_orderdate <= DATE '2000-12-31'",
        "catalog_sales": "o_orderdate >= DATE '2000-12-01'"
                         " AND o_orderdate <= DATE '2000-12-31'",
    },
)


def _q5_channel(cte: str, page_id: str, sales_part: str, returns_part: str,
                page_dim: str, page_key: str) -> str:
    """One q5 per-channel sales+returns UNION ALL leg (reference
    tpcds_sql/5.sql): sales rows carry zero returns, return rows carry
    zero sales, both aggregated per page/store/site over a 14-day
    window."""
    return f"""
    {cte} AS (
      SELECT {page_id},
             SUM(sales_price) AS sales,
             SUM(profit) AS profit,
             SUM(return_amt) AS returns_,
             SUM(net_loss) AS profit_loss
      FROM ({sales_part}
            UNION ALL
            {returns_part}) salesreturns, date_dim, {page_dim}
      WHERE date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 14 DAY
        AND page_sk = {page_key}
      GROUP BY {page_id}
    )"""


_register(
    "tpcds_q5",
    _q5_channel(
        "ssr", "s_store_id",
        """SELECT ss_store_sk AS page_sk, ss_sold_date_sk AS date_sk,
                  CAST(ss_ext_sales_price AS DECIMAL(38,6)) AS sales_price,
                  CAST(ss_net_profit AS DECIMAL(38,6)) AS profit,
                  CAST(0 AS DECIMAL(38,6)) AS return_amt,
                  CAST(0 AS DECIMAL(38,6)) AS net_loss
           FROM store_sales""",
        """SELECT sr_store_sk AS page_sk, sr_returned_date_sk AS date_sk,
                  CAST(0 AS DECIMAL(38,6)) AS sales_price,
                  CAST(0 AS DECIMAL(38,6)) AS profit,
                  CAST(sr_return_amt AS DECIMAL(38,6)) AS return_amt,
                  CAST(sr_net_loss AS DECIMAL(38,6)) AS net_loss
           FROM store_returns""",
        "store", "s_store_sk").replace("\n    ssr", ", ssr", 1)
    + ","
    + _q5_channel(
        "csr", "cp_catalog_page_id",
        """SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
                  CAST(cs_ext_sales_price AS DECIMAL(38,6)) AS sales_price,
                  CAST(cs_net_profit AS DECIMAL(38,6)) AS profit,
                  CAST(0 AS DECIMAL(38,6)) AS return_amt,
                  CAST(0 AS DECIMAL(38,6)) AS net_loss
           FROM catalog_sales""",
        """SELECT cr_catalog_page_sk AS page_sk,
                  cr_returned_date_sk AS date_sk,
                  CAST(0 AS DECIMAL(38,6)) AS sales_price,
                  CAST(0 AS DECIMAL(38,6)) AS profit,
                  CAST(cr_return_amount AS DECIMAL(38,6)) AS return_amt,
                  CAST(cr_net_loss AS DECIMAL(38,6)) AS net_loss
           FROM catalog_returns""",
        "catalog_page", "cp_catalog_page_sk")
    + ","
    + _q5_channel(
        "wsr", "web_site_id",
        """SELECT ws_web_site_sk AS page_sk, ws_sold_date_sk AS date_sk,
                  CAST(ws_ext_sales_price AS DECIMAL(38,6)) AS sales_price,
                  CAST(ws_net_profit AS DECIMAL(38,6)) AS profit,
                  CAST(0 AS DECIMAL(38,6)) AS return_amt,
                  CAST(0 AS DECIMAL(38,6)) AS net_loss
           FROM web_sales""",
        """SELECT ws_web_site_sk AS page_sk,
                  wr_returned_date_sk AS date_sk,
                  CAST(0 AS DECIMAL(38,6)) AS sales_price,
                  CAST(0 AS DECIMAL(38,6)) AS profit,
                  CAST(wr_return_amt AS DECIMAL(38,6)) AS return_amt,
                  CAST(wr_net_loss AS DECIMAL(38,6)) AS net_loss
           FROM web_returns LEFT OUTER JOIN web_sales
             ON (wr_item_sk = ws_item_sk
                 AND wr_order_number = ws_order_number)""",
        "web_site", "web_site_sk")
    + """
    SELECT channel, id,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns_) AS DOUBLE) AS returns_,
           CAST(SUM(profit) AS DOUBLE) AS profit
    FROM
      (SELECT 'store channel' AS channel, 'store' || s_store_id AS id,
              sales, returns_, profit - profit_loss AS profit
       FROM ssr
       UNION ALL
       SELECT 'catalog channel' AS channel,
              'catalog_page' || cp_catalog_page_id AS id,
              sales, returns_, profit - profit_loss AS profit
       FROM csr
       UNION ALL
       SELECT 'web channel' AS channel, 'web_site' || web_site_id AS id,
              sales, returns_, profit - profit_loss AS profit
       FROM wsr) x
    GROUP BY ROLLUP(channel, id)
    ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q5 (reference tpcds_sql/5.sql) executed: 14-day
    three-channel P&L — per-channel sales/returns UNION ALL legs
    aggregated per store / catalog page / web site, stitched under
    ROLLUP(channel, id).  catalog_sales/returns gain their
    catalog-page key and the catalog_page dim derives (200 pages);
    the web-returns leg keeps the reference's LEFT OUTER re-join to
    web_sales for its site key.  All money stays DECIMAL(38,6) until
    the final CAST DOUBLE; `returns` is aliased returns_ (DuckDB
    reserves it bare).  Date '1998-08-04'+14d verbatim; explicit
    NULLS FIRST pins the rollup rows under LIMIT 100.""",
)

_register(
    "tpcds_q77",
    """
    , ss AS (
      SELECT s_store_sk, SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6)))
                 AS sales,
             SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS profit
      FROM store_sales, date_dim, store
      WHERE ss_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND ss_store_sk = s_store_sk
      GROUP BY s_store_sk
    ),
    sr AS (
      SELECT s_store_sk, SUM(CAST(sr_return_amt AS DECIMAL(38,6)))
                 AS returns_,
             SUM(CAST(sr_net_loss AS DECIMAL(38,6))) AS profit_loss
      FROM store_returns, date_dim, store
      WHERE sr_returned_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND sr_store_sk = s_store_sk
      GROUP BY s_store_sk
    ),
    cs AS (
      SELECT cs_call_center_sk,
             SUM(CAST(cs_ext_sales_price AS DECIMAL(38,6))) AS sales,
             SUM(CAST(cs_net_profit AS DECIMAL(38,6))) AS profit
      FROM catalog_sales, date_dim
      WHERE cs_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
      GROUP BY cs_call_center_sk
    ),
    cr AS (
      SELECT cr_call_center_sk,
             SUM(CAST(cr_return_amount AS DECIMAL(38,6))) AS returns_,
             SUM(CAST(cr_net_loss AS DECIMAL(38,6))) AS profit_loss
      FROM catalog_returns, date_dim
      WHERE cr_returned_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
      GROUP BY cr_call_center_sk
    ),
    ws AS (
      SELECT wp_web_page_sk,
             SUM(CAST(ws_ext_sales_price AS DECIMAL(38,6))) AS sales,
             SUM(CAST(ws_net_profit AS DECIMAL(38,6))) AS profit
      FROM web_sales, date_dim, web_page
      WHERE ws_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND ws_web_page_sk = wp_web_page_sk
      GROUP BY wp_web_page_sk
    ),
    wr AS (
      SELECT wp_web_page_sk,
             SUM(CAST(wr_return_amt AS DECIMAL(38,6))) AS returns_,
             SUM(CAST(wr_net_loss AS DECIMAL(38,6))) AS profit_loss
      FROM web_returns, date_dim, web_page
      WHERE wr_returned_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND wr_web_page_sk = wp_web_page_sk
      GROUP BY wp_web_page_sk
    )
    SELECT channel, id,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns_) AS DOUBLE) AS returns_,
           CAST(SUM(profit) AS DOUBLE) AS profit
    FROM
      (SELECT 'store channel' AS channel, ss.s_store_sk AS id, sales,
              COALESCE(returns_, CAST(0 AS DECIMAL(38,6))) AS returns_,
              profit - COALESCE(profit_loss, CAST(0 AS DECIMAL(38,6)))
                  AS profit
       FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
       UNION ALL
       SELECT 'catalog channel' AS channel, cs_call_center_sk AS id,
              sales, returns_, profit - profit_loss AS profit
       FROM cs, cr
       UNION ALL
       SELECT 'web channel' AS channel, ws.wp_web_page_sk AS id, sales,
              COALESCE(returns_, CAST(0 AS DECIMAL(38,6))) AS returns_,
              profit - COALESCE(profit_loss, CAST(0 AS DECIMAL(38,6)))
                  AS profit
       FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
    GROUP BY ROLLUP(channel, id)
    ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q77 (reference tpcds_sql/77.sql) executed: 30-day
    per-channel profit & loss — store keyed by store, catalog by call
    center (the reference's verbatim CROSS JOIN of the cs and cr
    aggregates is kept), web by web page — under ROLLUP(channel, id).
    Money stays DECIMAL(38,6) through the outer SUM (COALESCE zeros are
    typed decimals so Spark doesn't widen to double early); `returns`
    aliased returns_ for DuckDB.  Date '1998-08-04'+30d verbatim.""",
)

_register(
    "tpcds_q80",
    """
    , ssr AS (
      SELECT s_store_id AS store_id,
             SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS sales,
             SUM(CAST(COALESCE(sr_return_amt, 0) AS DECIMAL(38,6)))
                 AS returns_,
             SUM(CAST(ss_net_profit AS DECIMAL(38,6))
                 - CAST(COALESCE(sr_net_loss, 0) AS DECIMAL(38,6)))
                 AS profit
      FROM store_sales LEFT OUTER JOIN store_returns
             ON (ss_item_sk = sr_item_sk
                 AND ss_ticket_number = sr_ticket_number),
           date_dim, store, item, promotion
      WHERE ss_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND ss_store_sk = s_store_sk
        AND ss_item_sk = i_item_sk
        AND i_current_price > 950
        AND ss_promo_sk = p_promo_sk
        AND p_channel_tv = 'N'
      GROUP BY s_store_id
    ),
    csr AS (
      SELECT cp_catalog_page_id AS catalog_page_id,
             SUM(CAST(cs_ext_sales_price AS DECIMAL(38,6))) AS sales,
             SUM(CAST(COALESCE(cr_return_amount, 0) AS DECIMAL(38,6)))
                 AS returns_,
             SUM(CAST(cs_net_profit AS DECIMAL(38,6))
                 - CAST(COALESCE(cr_net_loss, 0) AS DECIMAL(38,6)))
                 AS profit
      FROM catalog_sales LEFT OUTER JOIN catalog_returns
             ON (cs_item_sk = cr_item_sk
                 AND cs_order_number = cr_order_number),
           date_dim, catalog_page, item, promotion
      WHERE cs_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND cs_catalog_page_sk = cp_catalog_page_sk
        AND cs_item_sk = i_item_sk
        AND i_current_price > 950
        AND cs_promo_sk = p_promo_sk
        AND p_channel_tv = 'N'
      GROUP BY cp_catalog_page_id
    ),
    wsr AS (
      SELECT web_site_id,
             SUM(CAST(ws_ext_sales_price AS DECIMAL(38,6))) AS sales,
             SUM(CAST(COALESCE(wr_return_amt, 0) AS DECIMAL(38,6)))
                 AS returns_,
             SUM(CAST(ws_net_profit AS DECIMAL(38,6))
                 - CAST(COALESCE(wr_net_loss, 0) AS DECIMAL(38,6)))
                 AS profit
      FROM web_sales LEFT OUTER JOIN web_returns
             ON (ws_item_sk = wr_item_sk
                 AND ws_order_number = wr_order_number),
           date_dim, web_site, item, promotion
      WHERE ws_sold_date_sk = d_date_sk
        AND d_date BETWEEN CAST('1998-08-04' AS DATE)
                       AND CAST('1998-08-04' AS DATE) + INTERVAL 30 DAY
        AND ws_web_site_sk = web_site_sk
        AND ws_item_sk = i_item_sk
        AND i_current_price > 950
        AND ws_promo_sk = p_promo_sk
        AND p_channel_tv = 'N'
      GROUP BY web_site_id
    )
    SELECT channel, id,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns_) AS DOUBLE) AS returns_,
           CAST(SUM(profit) AS DOUBLE) AS profit
    FROM
      (SELECT 'store channel' AS channel, 'store' || store_id AS id,
              sales, returns_, profit
       FROM ssr
       UNION ALL
       SELECT 'catalog channel' AS channel,
              'catalog_page' || catalog_page_id AS id,
              sales, returns_, profit
       FROM csr
       UNION ALL
       SELECT 'web channel' AS channel, 'web_site' || web_site_id AS id,
              sales, returns_, profit
       FROM wsr) x
    GROUP BY ROLLUP(channel, id)
    ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q80 (reference tpcds_sql/80.sql) executed: 30-day
    three-channel P&L with returns netted per sale row (LEFT OUTER to
    the returns fact on item+ticket/order) restricted to
    non-TV-promoted expensive items.  web_sales gains ws_promo_sk;
    catalog gains its page key.  i_current_price > 50 retargets to
    > 950 (derived retail prices run 900-1000, so 50 selects
    everything and 950 keeps the reference's expensive-half
    selectivity intent).  Money decimal-exact to the final CAST DOUBLE; NULLS
    FIRST pins the rollup under LIMIT 100.""",
)


def _q66_leg(p: str, ship_mode_pair: str, carrier_a: str, carrier_b: str,
             date_col: str, time_col: str, wh_col: str, sm_col: str,
             price: str, net: str, qty: str, fact: str) -> str:
    """One q66 warehouse-month pivot leg (reference tpcds_sql/66.sql):
    12 monthly sales + 12 monthly net columns for one channel fact."""
    months_sales = "\n".join(
        f"             SUM(CASE WHEN d_moy = {m} THEN amt"
        f" ELSE CAST(0 AS DECIMAL(38,6)) END) AS m{m:02d}_sales,"
        for m in range(1, 13))
    months_net = ",\n".join(
        f"             SUM(CASE WHEN d_moy = {m} THEN net_amt"
        f" ELSE CAST(0 AS DECIMAL(38,6)) END) AS m{m:02d}_net"
        for m in range(1, 13))
    return f"""
      SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
             w_state, w_country,
             '{carrier_a}' || ',' || '{carrier_b}' AS ship_carriers,
             d_year AS year_,
{months_sales}
{months_net}
      FROM (SELECT {date_col} AS date_sk, {time_col} AS time_sk,
                   {wh_col} AS wh_sk, {sm_col} AS sm_sk,
                   CAST(CAST({price} AS DECIMAL(38,6))
                        * CAST({qty} AS DECIMAL(38,6)) AS DECIMAL(38,6))
                       AS amt,
                   CAST(CAST({net} AS DECIMAL(38,6))
                        * CAST({qty} AS DECIMAL(38,6)) AS DECIMAL(38,6))
                       AS net_amt
            FROM {fact}) f, warehouse, date_dim, time_dim, ship_mode
      WHERE wh_sk = w_warehouse_sk
        AND date_sk = d_date_sk
        AND time_sk = t_time_sk
        AND sm_sk = sm_ship_mode_sk
        AND d_year = 2000
        AND t_time BETWEEN 49530 AND 49530 + 28800
        AND sm_carrier IN ({ship_mode_pair})
      GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
               w_state, w_country, d_year"""


_register(
    "tpcds_q66",
    """
    SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
           w_country, ship_carriers, year_,
"""
    + ",\n".join(
        f"           CAST(SUM(m{m:02d}_sales) AS DOUBLE) AS m{m:02d}_sales"
        for m in range(1, 13)) + ","
    + ",\n".join(
        f"           CAST(SUM(CAST(m{m:02d}_sales AS DOUBLE)"
        f" / w_warehouse_sq_ft) AS DOUBLE) AS m{m:02d}_sales_per_sq_foot"
        for m in range(1, 13)) + ","
    + ",\n".join(
        f"           CAST(SUM(m{m:02d}_net) AS DOUBLE) AS m{m:02d}_net"
        for m in range(1, 13))
    + """
    FROM ("""
    + _q66_leg("", "'DIAMOND','AIRBORNE'", "DIAMOND", "AIRBORNE",
               "ws_sold_date_sk", "ws_sold_time_sk", "ws_warehouse_sk",
               "ws_ship_mode_sk", "ws_sales_price", "ws_net_paid_inc_tax",
               "ws_quantity", "web_sales")
    + """
      UNION ALL"""
    + _q66_leg("", "'UPS','FEDEX'", "UPS", "FEDEX",
               "cs_sold_date_sk", "cs_sold_time_sk", "cs_warehouse_sk",
               "cs_ship_mode_sk", "cs_sales_price", "cs_net_paid_inc_tax",
               "cs_quantity", "catalog_sales")
    + """
    ) x
    GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
             w_state, w_country, ship_carriers, year_
    ORDER BY w_warehouse_name
    LIMIT 100
    """,
    doc="""TPC-DS q66 (reference tpcds_sql/66.sql) executed: the
    warehouse monthly-pivot report — 12 sales + 12 per-sq-ft + 12 net
    columns per warehouse/carrier/year, web and catalog legs UNION
    ALLed.  price*quantity products are decimal-exact (the q17 macro
    shape) and month buckets stay DECIMAL(38,6) until the final CAST
    DOUBLE; warehouse gains sq_ft/city/county/country; time_dim gains
    t_time.  d_year 2002 -> 2000 (full-year coverage of the derived
    calendar); carriers DHL,BARIAN -> UPS,FEDEX (derived sm_carrier
    domain); the jan..dec column names become m01..m12 so the wide
    schema stays ordered.  Month columns named mNN_* on both sides;
    `year` aliased year_ (DuckDB keyword).""",
)

_register(
    "tpcds_q72",
    """
    SELECT /*+ MERGE(inv2) */
           i_item_desc, w_warehouse_name, d1.d_week_seq AS d_week_seq,
           CAST(SUM(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS no_promo,
           CAST(SUM(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS promo,
           CAST(COUNT(*) AS BIGINT) AS total_cnt
    FROM catalog_sales
    JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
    JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
    JOIN (SELECT inv_item_sk, inv_warehouse_sk, inv_quantity_on_hand,
                 d2.d_week_seq AS inv_week_seq
          FROM inventory
          JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)) inv2
      ON (cs_item_sk = inv2.inv_item_sk
          AND d1.d_week_seq = inv2.inv_week_seq)
    JOIN warehouse ON (w_warehouse_sk = inv2.inv_warehouse_sk)
    JOIN item ON (i_item_sk = cs_item_sk)
    JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
    JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
    LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
    LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk
                                        AND cr_order_number
                                            = cs_order_number)
    WHERE inv2.inv_quantity_on_hand < cs_quantity
      AND cs_ship_date_sk > cs_sold_date_sk + 5
      AND hd_buy_potential = '1001-5000'
      AND d1.d_year = 2001
      AND cd_marital_status = 'M'
    GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
    ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d_week_seq
    LIMIT 100
    """,
    doc="""TPC-DS q72 (reference tpcds_sql/72.sql) executed: catalog
    orders that outstrip same-week inventory, shipped more than 5 days
    late, for married mid-potential households — the 3-date-role join
    (sold/inventory/ship) plus demographic dims and LEFT JOINs to
    promotion and returns.  catalog_sales gains cs_bill_hdemo_sk;
    counts BIGINT.  ONE deliberate restructure vs the reference text
    (same predicate set, identical rows): the reference spells
    catalog_sales JOIN inventory ON item alone with
    d1.d_week_seq = d2.d_week_seq left in WHERE — a many-to-many
    item-only expansion (every sale row × every inventory snapshot of
    that item) that a cost-based reorderer prunes but Spark's
    syntax-ordered planner executes as written (77s at sf0.01, the
    known q72 join-order hazard).  Pre-joining inventory to its
    date_dim and lifting the week-seq equality INTO the join key makes
    the big join a well-keyed (item, week) equi-join; the year-2001
    broadcast date join prunes the sales side first.  Second
    restructure: the reference's d3.d_date > d1.d_date + INTERVAL 5
    DAY is a cross-dimension inequality that defeats BOTH engines'
    planners (DuckDB alone spent 54s on it at sf0.01 — it blocks
    pushing either date join down); under this schema's derivation
    d_date_sk = datediff(d_date, epoch) + 2450000 is strictly linear
    in d_date, so the predicate is EXACTLY cs_ship_date_sk >
    cs_sold_date_sk + 5 — a fact-local filter that pushes to the
    parquet scan (true for real TPC-DS date_dim too, where date_sk
    is contiguous-by-day).  At 100 TB this is the difference between
    an O(sales×snapshots-per-item) blowup plus an unpushable late
    filter and a pruned scan feeding a composite-key shuffle AQE can
    split.  The MERGE(inv2) hint pins the inventory leg to a shuffle
    join: inventory is fact-sized at every real SF, but the static
    estimate of the pre-joined subquery can fall under the broadcast
    threshold — at sf1 that misestimated broadcast OOMed an 8 GB
    driver (found by tools/scale_check.py, r7); a fact side must never
    be broadcast regardless of what the estimator says.""",
)

_register(
    "tpcds_q75",
    """
    , all_sales AS (
      SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
             SUM(sales_cnt) AS sales_cnt, SUM(sales_amt) AS sales_amt
      FROM (SELECT d_year, i_brand_id, i_class_id, i_category_id,
                   i_manufact_id,
                   CAST(cs_quantity AS DECIMAL(38,6))
                       - CAST(COALESCE(cr_return_quantity, 0)
                              AS DECIMAL(38,6)) AS sales_cnt,
                   CAST(cs_ext_sales_price AS DECIMAL(38,6))
                       - CAST(COALESCE(cr_return_amount, 0.0)
                              AS DECIMAL(38,6)) AS sales_amt
            FROM catalog_sales
            JOIN item ON i_item_sk = cs_item_sk
            JOIN date_dim ON d_date_sk = cs_sold_date_sk
            LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
                                          AND cs_item_sk = cr_item_sk)
            WHERE i_category = 'STANDARD'
            UNION
            SELECT d_year, i_brand_id, i_class_id, i_category_id,
                   i_manufact_id,
                   CAST(ss_quantity AS DECIMAL(38,6))
                       - CAST(COALESCE(sr_return_quantity, 0)
                              AS DECIMAL(38,6)) AS sales_cnt,
                   CAST(ss_ext_sales_price AS DECIMAL(38,6))
                       - CAST(COALESCE(sr_return_amt, 0.0)
                              AS DECIMAL(38,6)) AS sales_amt
            FROM store_sales
            JOIN item ON i_item_sk = ss_item_sk
            JOIN date_dim ON d_date_sk = ss_sold_date_sk
            LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
                                        AND ss_item_sk = sr_item_sk)
            WHERE i_category = 'STANDARD'
            UNION
            SELECT d_year, i_brand_id, i_class_id, i_category_id,
                   i_manufact_id,
                   CAST(ws_quantity AS DECIMAL(38,6))
                       - CAST(COALESCE(wr_return_quantity, 0)
                              AS DECIMAL(38,6)) AS sales_cnt,
                   CAST(ws_ext_sales_price AS DECIMAL(38,6))
                       - CAST(COALESCE(wr_return_amt, 0.0)
                              AS DECIMAL(38,6)) AS sales_amt
            FROM web_sales
            JOIN item ON i_item_sk = ws_item_sk
            JOIN date_dim ON d_date_sk = ws_sold_date_sk
            LEFT JOIN web_returns ON (ws_order_number = wr_order_number
                                      AND ws_item_sk = wr_item_sk)
            WHERE i_category = 'STANDARD') sales_detail
      GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id
    )
    SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS year_,
           curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
           curr_yr.i_manufact_id,
           CAST(prev_yr.sales_cnt AS DOUBLE) AS prev_yr_cnt,
           CAST(curr_yr.sales_cnt AS DOUBLE) AS curr_yr_cnt,
           CAST(curr_yr.sales_cnt - prev_yr.sales_cnt AS DOUBLE)
               AS sales_cnt_diff,
           CAST(curr_yr.sales_amt - prev_yr.sales_amt AS DOUBLE)
               AS sales_amt_diff
    FROM all_sales curr_yr, all_sales prev_yr
    WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
      AND curr_yr.i_class_id = prev_yr.i_class_id
      AND curr_yr.i_category_id = prev_yr.i_category_id
      AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
      AND curr_yr.d_year = 2000
      AND prev_yr.d_year = 2000 - 1
      AND CAST(curr_yr.sales_cnt AS DOUBLE)
          / CAST(NULLIF(prev_yr.sales_cnt, 0) AS DOUBLE) < 0.9
    ORDER BY sales_cnt_diff, sales_amt_diff,
             curr_yr.i_brand_id, curr_yr.i_class_id,
             curr_yr.i_category_id, curr_yr.i_manufact_id
    LIMIT 100
    """,
    doc="""TPC-DS q75 (reference tpcds_sql/75.sql) executed: net
    quantity/amount sold per item identity across all three channels
    (UNION-deduplicated, returns netted via LEFT JOIN), year-over-year
    self-join keeping identities whose net unit sales shrank >10%.
    item gains i_class_id.  Adaptations: i_category Sports ->
    STANDARD (derived p_type domain); 2002/2001 -> 2000/1999 (the
    derived calendar's last full year pair); the DECIMAL(17,2) ratio
    division becomes IEEE double division over NULLIF(prev,0) (exact
    decimal operands; ANSI Spark raises on /0 where DuckDB yields inf
    — NULLIF excludes zero-denominator rows identically on both);
    ORDER BY gains the four item-identity keys after the reference's
    diff keys so the LIMIT cut is deterministic under ties.""",
)

_register_shared_fact(
    "tpcds_q78",
    """
    , ws AS (
      SELECT d_year AS ws_sold_year, ws_item_sk,
             ws_bill_customer_sk AS ws_customer_sk,
             SUM(CAST(ws_quantity AS DECIMAL(38,6))) AS ws_qty,
             SUM(CAST(ws_wholesale_cost AS DECIMAL(38,6))) AS ws_wc,
             SUM(CAST(ws_sales_price AS DECIMAL(38,6))) AS ws_sp
      FROM web_sales
      LEFT JOIN web_returns ON wr_order_number = ws_order_number
                            AND ws_item_sk = wr_item_sk
      JOIN date_dim ON ws_sold_date_sk = d_date_sk
      WHERE wr_order_number IS NULL
      GROUP BY d_year, ws_item_sk, ws_bill_customer_sk
    ),
    cs AS (
      SELECT d_year AS cs_sold_year, cs_item_sk,
             cs_bill_customer_sk AS cs_customer_sk,
             SUM(CAST(cs_quantity AS DECIMAL(38,6))) AS cs_qty,
             SUM(CAST(cs_wholesale_cost AS DECIMAL(38,6))) AS cs_wc,
             SUM(CAST(cs_sales_price AS DECIMAL(38,6))) AS cs_sp
      FROM catalog_sales
      LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
                                AND cs_item_sk = cr_item_sk
      JOIN date_dim ON cs_sold_date_sk = d_date_sk
      WHERE cr_order_number IS NULL
      GROUP BY d_year, cs_item_sk, cs_bill_customer_sk
    ),
    ss AS (
      SELECT d_year AS ss_sold_year, ss_item_sk, ss_customer_sk,
             SUM(CAST(ss_quantity AS DECIMAL(38,6))) AS ss_qty,
             SUM(CAST(ss_wholesale_cost AS DECIMAL(38,6))) AS ss_wc,
             SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS ss_sp
      FROM store_sales
      LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
                              AND ss_item_sk = sr_item_sk
      JOIN date_dim ON ss_sold_date_sk = d_date_sk
      WHERE sr_ticket_number IS NULL
      GROUP BY d_year, ss_item_sk, ss_customer_sk
    )
    SELECT ss_sold_year, ss_item_sk, ss_customer_sk,
           CAST(ROUND(CAST(ss_qty AS DOUBLE)
                      / (COALESCE(CAST(ws_qty AS DOUBLE), 0)
                         + COALESCE(CAST(cs_qty AS DOUBLE), 0)), 2)
                AS DOUBLE) AS ratio,
           CAST(ss_qty AS DOUBLE) AS store_qty,
           CAST(ss_wc AS DOUBLE) AS store_wholesale_cost,
           CAST(ss_sp AS DOUBLE) AS store_sales_price,
           CAST(COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS DOUBLE)
               AS other_chan_qty,
           CAST(COALESCE(ws_wc, 0) + COALESCE(cs_wc, 0) AS DOUBLE)
               AS other_chan_wholesale_cost,
           CAST(COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) AS DOUBLE)
               AS other_chan_sales_price
    FROM ss
    LEFT JOIN ws ON (ws_sold_year = ss_sold_year
                     AND ws_item_sk = ss_item_sk
                     AND ws_customer_sk = ss_customer_sk)
    LEFT JOIN cs ON (cs_sold_year = ss_sold_year
                     AND cs_item_sk = ss_item_sk
                     AND cs_customer_sk = ss_customer_sk)
    WHERE (COALESCE(ws_qty, 0) > 0 OR COALESCE(cs_qty, 0) > 0)
      AND ss_sold_year = 2000
    ORDER BY ss_sold_year, ss_item_sk, ss_customer_sk, ss_qty DESC,
             ss_wc DESC, ss_sp DESC, other_chan_qty,
             other_chan_wholesale_cost, other_chan_sales_price, ratio
    LIMIT 100
    """,
    doc="""TPC-DS q78 (reference tpcds_sql/78.sql) executed VERBATIM
    (constants included): per item-customer-year, store-channel volume
    kept only for never-returned sales (anti-join spelled as the
    reference's LEFT JOIN .. IS NULL), compared against the summed
    web+catalog volume.  web/catalog facts gain per-unit
    wholesale-cost columns; quantity/cost sums are decimal-exact and
    the round(ratio,2) rounds an IEEE double identically on both
    engines.  The three channel aggregations shuffle once each on
    (year, item, customer) and the two LEFT JOINs reuse that
    partitioning.""",
    facts=["store_sales", "web_sales", "catalog_sales",
           "store_returns", "web_returns", "catalog_returns"],
    # The ss aggregate groups by d_year and the final WHERE keeps only
    # ss_sold_year = 2000, so store fact rows outside calendar-2000 feed
    # only discarded groups; ws/cs groups join ss on ws/cs_sold_year =
    # ss_sold_year (= 2000), so their other-year groups never match the
    # LEFT JOIN either — dropping those input rows removes whole
    # non-matching groups and nothing else.  The RETURNS channels feed
    # the never-returned anti-joins (IS NULL) with no date constraint:
    # a return in ANY year disqualifies a sale, so they stay unfiltered.
    fact_where={
        "store_sales": "o_orderdate >= DATE '2000-01-01'"
                       " AND o_orderdate <= DATE '2000-12-31'",
        "web_sales": "o_orderdate >= DATE '2000-01-01'"
                     " AND o_orderdate <= DATE '2000-12-31'",
        "catalog_sales": "o_orderdate >= DATE '2000-01-01'"
                         " AND o_orderdate <= DATE '2000-12-31'",
    },
)


_register(
    "tpcds_q8",
    """
    SELECT s_store_name,
           CAST(SUM(CAST(ss_net_profit AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_profit
    FROM store_sales, date_dim, store,
         (SELECT zip5 AS ca_zip
          FROM (SELECT substr(ca_zip, 1, 5) AS zip5
                FROM customer_address
                WHERE substr(ca_zip, 1, 5) IN (
                    '00131','00262','00393','00524','00655','00786',
                    '00917','01048','01179','01310','01441','01572',
                    '01703','01834','01965','02096','02227','02358',
                    '02489','02620','03013','03275','03537','03930',
                    '04323','04585','05240','05764','06288','06550',
                    '07205','07729','08253','08777','09432','09956',
                    '10480','11004','11528','12052','12576')
                INTERSECT
                SELECT zip5
                FROM (SELECT substr(ca_zip, 1, 5) AS zip5,
                             COUNT(*) AS cnt
                      FROM customer_address, customer
                      WHERE ca_address_sk = c_current_addr_sk
                        AND c_preferred_cust_flag = 'Y'
                      GROUP BY substr(ca_zip, 1, 5)
                      HAVING COUNT(*) > 4) A1) A2) V1
    WHERE ss_store_sk = s_store_sk
      AND ss_sold_date_sk = d_date_sk
      AND d_qoy = 1 AND d_year = 2001
      AND (substr(s_zip, 1, 2) = substr(V1.ca_zip, 1, 2))
    GROUP BY s_store_name
    ORDER BY s_store_name
    LIMIT 100
    """,
    doc="""TPC-DS q8 (reference tpcds_sql/8.sql) executed: store
    profit for Q1 restricted to stores whose 2-digit zip prefix
    appears both in a fixed zip list and among zips with many
    preferred customers (IN-list INTERSECT grouped-HAVING, then the
    store-side prefix semi-join).  The reference's 400 literal zips
    retarget to 41 values of the derived ca_zip prefix domain
    (multiples of 131, zero-padded); HAVING >10 -> >4 (about 8
    preferred customers land per prefix at sf0.01, the reference's
    >10 was tuned to ~300-customer zips); d_year 2002 -> 2001 (last
    derived Q1).  The reference's substr-alias shadowing its base column
    in GROUP BY (group by ca_zip meaning the 5-char prefix) is spelled
    explicitly (zip5 / GROUP BY substr) — both engines otherwise bind
    the base column and the HAVING never fires.  Note the prefix
    semi-join duplicates store rows per qualifying zip exactly as the
    reference text does.""",
)

_register(
    "tpcds_q54",
    """
    , my_customers AS (
      SELECT DISTINCT c_customer_sk, c_current_addr_sk
      FROM (SELECT cs_sold_date_sk AS sold_date_sk,
                   cs_bill_customer_sk AS customer_sk,
                   cs_item_sk AS item_sk
            FROM catalog_sales
            UNION ALL
            SELECT ws_sold_date_sk AS sold_date_sk,
                   ws_bill_customer_sk AS customer_sk,
                   ws_item_sk AS item_sk
            FROM web_sales) cs_or_ws_sales,
           item, date_dim, customer
      WHERE sold_date_sk = d_date_sk
        AND item_sk = i_item_sk
        AND i_category = 'STANDARD'
        AND i_class = 'CLASS#3'
        AND c_customer_sk = cs_or_ws_sales.customer_sk
        AND d_moy = 3
        AND d_year = 1999
    ),
    my_revenue AS (
      SELECT c_customer_sk,
             SUM(CAST(ss_ext_sales_price AS DECIMAL(38,6))) AS revenue
      FROM my_customers, store_sales, customer_address, store, date_dim
      WHERE c_current_addr_sk = ca_address_sk
        AND ca_state = s_state
        AND ss_sold_date_sk = d_date_sk
        AND c_customer_sk = ss_customer_sk
        AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1
                                 FROM date_dim
                                 WHERE d_year = 1999 AND d_moy = 3)
                            AND (SELECT DISTINCT d_month_seq + 3
                                 FROM date_dim
                                 WHERE d_year = 1999 AND d_moy = 3)
      GROUP BY c_customer_sk
    ),
    segments AS (
      SELECT CAST(FLOOR(CAST(revenue AS DOUBLE) / 50) AS INT) AS segment
      FROM my_revenue
    )
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS num_customers,
           segment * 50 AS segment_base
    FROM segments
    GROUP BY segment
    ORDER BY segment, num_customers
    LIMIT 100
    """,
    doc="""TPC-DS q54 (reference tpcds_sql/54.sql) executed: customers
    who bought a given category/class from catalog or web in March,
    then their store revenue over the following 3 months (bucketed
    into $50 segments) where they live in a store state.  Adaptations:
    Jewelry/consignment -> STANDARD/CLASS#3 (derived domains); the
    reference's ca_county = s_county AND ca_state = s_state
    colocation keeps only the state leg — the two derived county
    domains are disjoint by construction (county_N vs named counties)
    so county equality would be empty for every customer; state
    carries the lives-near-a-store semantics (GA overlaps).  The
    segment cast spells FLOOR(double/50) — CAST-to-INT rounds
    half-even in DuckDB but truncates in Spark, and revenue is
    positive so floor == the reference's truncation.  Note the
    store join is intentionally a semi-join-like multiplier in the
    reference text (each state match duplicates revenue rows);
    kept verbatim.""",
)


def _q14_channel(channel: str, fact: str, p: str) -> str:
    """One q14 channel leg: cross-channel items only, November of the
    target year, brand/class/category revenue vs the all-channel mean."""
    return f"""
       SELECT '{channel}' AS channel, i_brand_id, i_class_id,
              i_category_id,
              SUM(CAST(CAST({p}_quantity AS DECIMAL(38,6))
                  * CAST({p}_list_price AS DECIMAL(38,6))
                  AS DECIMAL(38,6))) AS sales,
              CAST(COUNT(*) AS BIGINT) AS number_sales
       FROM {fact}, item, date_dim
       WHERE {p}_item_sk IN (SELECT ss_item_sk FROM cross_items)
         AND {p}_item_sk = i_item_sk
         AND {p}_sold_date_sk = d_date_sk
         AND d_year = 1998 + 2
         AND d_moy = 11
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING CAST(SUM(CAST(CAST({p}_quantity AS DECIMAL(38,6))
                  * CAST({p}_list_price AS DECIMAL(38,6))
                  AS DECIMAL(38,6))) AS DOUBLE)
              > (SELECT average_sales FROM avg_sales)"""


_register_shared_fact(
    "tpcds_q14",
    """
    , cross_items AS (
      SELECT i_item_sk AS ss_item_sk
      FROM item,
           (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
                   iss.i_category_id AS category_id
            FROM store_sales, item iss, date_dim d1
            WHERE ss_item_sk = iss.i_item_sk
              AND ss_sold_date_sk = d1.d_date_sk
              AND d1.d_year BETWEEN 1998 AND 1998 + 2
            INTERSECT
            SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
            FROM catalog_sales, item ics, date_dim d2
            WHERE cs_item_sk = ics.i_item_sk
              AND cs_sold_date_sk = d2.d_date_sk
              AND d2.d_year BETWEEN 1998 AND 1998 + 2
            INTERSECT
            SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
            FROM web_sales, item iws, date_dim d3
            WHERE ws_item_sk = iws.i_item_sk
              AND ws_sold_date_sk = d3.d_date_sk
              AND d3.d_year BETWEEN 1998 AND 1998 + 2) x
      WHERE i_brand_id = brand_id
        AND i_class_id = class_id
        AND i_category_id = category_id
    ),
    avg_sales AS (
      SELECT CAST(SUM(amt) AS DOUBLE) / COUNT(*) AS average_sales
      FROM (SELECT CAST(CAST(ss_quantity AS DECIMAL(38,6))
                   * CAST(ss_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2
            UNION ALL
            SELECT CAST(CAST(cs_quantity AS DECIMAL(38,6))
                   * CAST(cs_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM catalog_sales, date_dim
            WHERE cs_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2
            UNION ALL
            SELECT CAST(CAST(ws_quantity AS DECIMAL(38,6))
                   * CAST(ws_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM web_sales, date_dim
            WHERE ws_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2) x
    )
    SELECT channel, i_brand_id, i_class_id, i_category_id,
           CAST(SUM(sales) AS DOUBLE) AS sum_sales,
           CAST(SUM(number_sales) AS BIGINT) AS sum_number_sales
    FROM ("""
    + _q14_channel("store", "store_sales", "ss")
    + """
       UNION ALL"""
    + _q14_channel("catalog", "catalog_sales", "cs")
    + """
       UNION ALL"""
    + _q14_channel("web", "web_sales", "ws")
    + """
    ) y
    GROUP BY ROLLUP(channel, i_brand_id, i_class_id, i_category_id)
    ORDER BY channel ASC NULLS FIRST, i_brand_id ASC NULLS FIRST,
             i_class_id ASC NULLS FIRST, i_category_id ASC NULLS FIRST
    LIMIT 100
    """,
    doc="""TPC-DS q14 (reference tpcds_sql/14.sql, first statement)
    executed: brand/class/category identities sold through ALL three
    channels over 1998-2000 (three-way INTERSECT), then November-2000
    revenue per channel for those items, kept above the all-channel
    mean ticket (scalar subquery in HAVING), ROLLUPed.  quantity *
    list_price products decimal-exact (q17 macro shape); the unnamed
    sum()s alias sum_sales / sum_number_sales on both sides; NULLS
    FIRST pins the rollup under LIMIT 100.  Constants verbatim.""",
    facts=["store_sales", "web_sales", "catalog_sales"],
    # Every q14 fact reference joins date_dim on {p}_sold_date_sk =
    # d_date_sk with d_year BETWEEN 1998 AND 2000 (cross_items,
    # avg_sales) or d_year = 2000 AND d_moy = 11 (channel legs).
    # sold_date_sk = datediff(o_orderdate,'1992-01-01') + 2450000 and
    # d_date_sk is the same injective function of d_date, whose domain
    # [1995-01-01, 2001-12-31] covers 1998-2000 — so the join match set
    # is exactly o_orderdate in the window below; rows outside it can
    # never reach any of the nine fact consumptions.
    mat_where="o_orderdate >= DATE '1998-01-01'"
              " AND o_orderdate <= DATE '2000-12-31'",
    # cross_items is consumed by all three channel legs; inline, Spark
    # re-derives the 3-channel INTERSECT per leg (9 fact passes).  The
    # second-level materialization computes it once (item-grain rows).
    # avg_sales was measured too: the extra write+read round-trip cost
    # more than the saved recomputation (interleaved A/B min 4.02 vs
    # 3.90 with both mats, 3.54 vs 3.98 with cross_items only).
    mat_ctes=["cross_items"],
    mat_final_marker="SELECT channel, i_brand_id",
)

_Q23_CTES = """
    , frequent_ss_items AS (
      SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
             d_date AS solddate, COUNT(*) AS cnt
      FROM store_sales, date_dim, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_item_sk = i_item_sk
        AND d_year IN (1998, 1998 + 1, 1998 + 2, 1998 + 3)
      GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
      HAVING COUNT(*) > 1
    ),
    max_store_sales AS (
      SELECT MAX(csales) AS tpcds_cmax
      FROM (SELECT c_customer_sk,
                   SUM(CAST(CAST(ss_quantity AS DECIMAL(38,6))
                       * CAST(ss_sales_price AS DECIMAL(38,6))
                       AS DECIMAL(38,6))) AS csales
            FROM store_sales, customer, date_dim
            WHERE ss_customer_sk = c_customer_sk
              AND ss_sold_date_sk = d_date_sk
              AND d_year IN (1998, 1998 + 1, 1998 + 2, 1998 + 3)
            GROUP BY c_customer_sk) t
    ),
    best_ss_customer AS (
      SELECT c_customer_sk,
             SUM(CAST(CAST(ss_quantity AS DECIMAL(38,6))
                 * CAST(ss_sales_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6))) AS ssales
      FROM store_sales, customer
      WHERE ss_customer_sk = c_customer_sk
      GROUP BY c_customer_sk
      HAVING CAST(SUM(CAST(CAST(ss_quantity AS DECIMAL(38,6))
                 * CAST(ss_sales_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6))) AS DOUBLE)
             > CAST(95 / 100.0 AS DOUBLE)
               * (SELECT CAST(tpcds_cmax AS DOUBLE) FROM max_store_sales)
    )
"""

_register(
    "tpcds_q23",
    _Q23_CTES + """
    SELECT CAST(SUM(sales) AS DOUBLE) AS sum_sales
    FROM (SELECT CAST(CAST(cs_quantity AS DECIMAL(38,6))
                 * CAST(cs_list_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6)) AS sales
          FROM catalog_sales, date_dim
          WHERE d_year = 1998 + 2
            AND d_moy = 6
            AND cs_sold_date_sk = d_date_sk
            AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
            AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                        FROM best_ss_customer)
          UNION ALL
          SELECT CAST(CAST(ws_quantity AS DECIMAL(38,6))
                 * CAST(ws_list_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6)) AS sales
          FROM web_sales, date_dim
          WHERE d_year = 1998 + 2
            AND d_moy = 6
            AND ws_sold_date_sk = d_date_sk
            AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
            AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                        FROM best_ss_customer)) x
    LIMIT 100
    """,
    doc="""TPC-DS q23 (reference tpcds_sql/23.sql, first statement)
    executed: catalog+web June revenue restricted to frequently-bought
    store items (same item repeat-bought on one day; the reference's
    >4 threshold retargets to >1 — the derived order density tops out
    at 2-3 same-item tickets per day below sf0.1, so >4 is empty by
    construction) and the top-5%%
    store spenders (HAVING against the MAX scalar).  The spend
    comparison casts both sides to DOUBLE (the 95/100 factor times an
    exact decimal max) so threshold rounding is engine-identical.
    d_year base 1999 -> 1998 (the derived calendar's densest 4-year
    span ending before the 2001-08 order cutoff).""",
)


_Q24_SSALES = """
    , ssales AS (
      SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
             i_color, i_current_price, i_manager_id, i_units, i_size,
             SUM(CAST(ss_sales_price AS DECIMAL(38,6))) AS netpaid
      FROM store_sales, store_returns, store, item, customer,
           customer_address
      WHERE ss_ticket_number = sr_ticket_number
        AND ss_item_sk = sr_item_sk
        AND ss_customer_sk = c_customer_sk
        AND ss_item_sk = i_item_sk
        AND ss_store_sk = s_store_sk
        AND c_current_addr_sk = ca_address_sk
        AND c_birth_country <> upper(ca_country)
        AND s_zip = ca_zip
        AND s_market_id = 7
      GROUP BY c_last_name, c_first_name, s_store_name, ca_state,
               s_state, i_color, i_current_price, i_manager_id,
               i_units, i_size
    )
"""

_register(
    "tpcds_q24",
    _Q24_SSALES + """
    SELECT c_last_name, c_first_name, s_store_name,
           CAST(SUM(netpaid) AS DOUBLE) AS paid
    FROM ssales
    WHERE i_color = 'orchid'
    GROUP BY c_last_name, c_first_name, s_store_name
    HAVING CAST(SUM(netpaid) AS DOUBLE)
           > (SELECT 0.05 * (CAST(SUM(netpaid) AS DOUBLE)
                             / COUNT(netpaid))
              FROM ssales)
    ORDER BY c_last_name, c_first_name, s_store_name
    """,
    doc="""TPC-DS q24 (reference tpcds_sql/24.sql, first statement)
    executed VERBATIM (s_market_id = 7, i_color = 'orchid', the full
    s_zip = ca_zip equality and the 5%%-of-average HAVING all as
    written): returned store purchases by customers whose address zip
    equals their store's zip.  Satisfiable because s_zip now derives
    through the same key function as ca_zip (store id doubles as a
    pseudo-custkey), so each store matches the custkey residue class
    id mod 1261.  The avg in the HAVING subquery spells
    SUM/COUNT-double (Spark avg(decimal) widens scale differently
    than DuckDB); netpaid stays decimal until comparison/output.""",
)

_register_shared_cte(
    "tpcds_q64",
    """
    , cs_ui AS (
      SELECT cs_item_sk,
             SUM(CAST(cs_ext_list_price AS DECIMAL(38,6))) AS sale,
             SUM(CAST(cr_refunded_cash AS DECIMAL(38,6))
                 + CAST(cr_reversed_charge AS DECIMAL(38,6))
                 + CAST(cr_store_credit AS DECIMAL(38,6))) AS refund
      FROM catalog_sales, catalog_returns
      WHERE cs_item_sk = cr_item_sk
        AND cs_order_number = cr_order_number
      GROUP BY cs_item_sk
      HAVING CAST(SUM(CAST(cs_ext_list_price AS DECIMAL(38,6)))
                  AS DOUBLE)
             > 2 * CAST(SUM(CAST(cr_refunded_cash AS DECIMAL(38,6))
                            + CAST(cr_reversed_charge AS DECIMAL(38,6))
                            + CAST(cr_store_credit AS DECIMAL(38,6)))
                        AS DOUBLE)
    ),
    cross_sales AS (
      SELECT i_product_name AS product_name, i_item_sk AS item_sk,
             s_store_name AS store_name, s_zip AS store_zip,
             ad1.ca_street_number AS b_street_number,
             ad1.ca_street_name AS b_street_name,
             ad1.ca_city AS b_city, ad1.ca_zip AS b_zip,
             ad2.ca_street_number AS c_street_number,
             ad2.ca_street_name AS c_street_name,
             ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
             d1.d_year AS syear, d2.d_year AS fsyear, d3.d_year AS s2year,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(ss_wholesale_cost AS DECIMAL(38,6))) AS s1,
             SUM(CAST(ss_list_price AS DECIMAL(38,6))) AS s2,
             SUM(CAST(ss_coupon_amt AS DECIMAL(38,6))) AS s3
      FROM store_sales, store_returns, cs_ui, date_dim d1, date_dim d2,
           date_dim d3, store, customer, customer_demographics cd1,
           customer_demographics cd2, promotion,
           household_demographics hd1, household_demographics hd2,
           customer_address ad1, customer_address ad2, income_band ib1,
           income_band ib2, item
      WHERE ss_store_sk = s_store_sk
        AND ss_sold_date_sk = d1.d_date_sk
        AND ss_customer_sk = c_customer_sk
        AND ss_cdemo_sk = cd1.cd_demo_sk
        AND ss_hdemo_sk = hd1.hd_demo_sk
        AND ss_addr_sk = ad1.ca_address_sk
        AND ss_item_sk = i_item_sk
        AND ss_item_sk = sr_item_sk
        AND ss_ticket_number = sr_ticket_number
        AND ss_item_sk = cs_ui.cs_item_sk
        AND c_current_cdemo_sk = cd2.cd_demo_sk
        AND c_current_hdemo_sk = hd2.hd_demo_sk
        AND c_current_addr_sk = ad2.ca_address_sk
        AND c_first_sales_date_sk = d2.d_date_sk
        AND c_first_shipto_date_sk = d3.d_date_sk
        AND ss_promo_sk = p_promo_sk
        AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
        AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
        AND cd1.cd_marital_status <> cd2.cd_marital_status
        AND i_color IN ('orchid', 'chiffon', 'lace', 'navy', 'salmon',
                        'peru')
        AND i_current_price BETWEEN 920 AND 920 + 50
        AND i_current_price BETWEEN 920 + 1 AND 920 + 65
      GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
               ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city,
               ad1.ca_zip, ad2.ca_street_number, ad2.ca_street_name,
               ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year
    )
    SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
           cs1.b_street_number, cs1.b_street_name, cs1.b_city,
           cs1.b_zip, cs1.c_street_number, cs1.c_street_name,
           cs1.c_city, cs1.c_zip, cs1.syear, cs1.cnt,
           CAST(cs1.s1 AS DOUBLE) AS s11,
           CAST(cs1.s2 AS DOUBLE) AS s21,
           CAST(cs1.s3 AS DOUBLE) AS s31,
           CAST(cs2.s1 AS DOUBLE) AS s12,
           CAST(cs2.s2 AS DOUBLE) AS s22,
           CAST(cs2.s3 AS DOUBLE) AS s32,
           cs2.syear AS syear2, cs2.cnt AS cnt2
    FROM cross_sales cs1, cross_sales cs2
    WHERE cs1.item_sk = cs2.item_sk
      AND cs1.syear = 2000
      AND cs2.syear = 2000 + 1
      AND cs2.cnt <= cs1.cnt
      AND cs1.store_name = cs2.store_name
      AND cs1.store_zip = cs2.store_zip
    ORDER BY cs1.product_name, cs1.store_name, cnt2, s11, s12
    """,
    doc="""TPC-DS q64 (reference tpcds_sql/64.sql) executed: the
    17-relation cross-channel resale chain — returned store sales of
    heavily-catalog-returned items, every demographic/address/income
    dimension joined twice (purchase-time vs current), grouped per
    item-store-address identity and self-joined year-over-year
    (2000 vs 2001, the derived calendar's final pair).  Satisfiable
    by construction after this round's derivation work: ss_cdemo_sk
    varies per line so cd1 <> cd2 holds, customer gains
    first-sales/first-shipto date keys, catalog_returns gains
    reversed-charge/store-credit.  i_color list retargets to six of
    the eight derived colors, price band 35..50/36..50 -> 920..970/
    921..985 (derived 900-1000 retail domain).  cs2 duplicate
    column names (syear, cnt) alias syear2/cnt2 so the driver frame
    is hashable; money decimal-exact to the final CASTs.  No LIMIT:
    the hash compare is order-insensitive, ORDER BY kept verbatim.

    Execution shape (r13, guide §3.3/§2.3): cross_sales — consumed
    twice by the year-over-year self-join — is materialized ONCE per
    invocation (Spark inlines the CTE, so the inline spelling ran the
    whole 17-relation chain, its fact pass, cs_ui and ~15 dimension
    broadcast builds TWICE; the r13 stage profile shows the two
    duplicated agg stages reading the same 22 MB fact shuffle).  The
    mat keeps only syear IN (2000, 2001) — the final statement's own
    cs1.syear = 2000 / cs2.syear = 2001 predicates — and the
    equivalent o_orderdate >= DATE '2000-01-01' window is pushed
    below the fact base join (ss_sold_date_sk = f(o_orderdate),
    f injective, calendar ends 2001-12-31, so the window keeps
    exactly the rows whose d1 join can satisfy the syear filter).
    r13 interleaved A/B at sf0.1: inline 2.70/3.87 (min/med) ->
    2.28/2.36 s, rows identical every cycle; pinned at 2 SFs.""",
    cte="cross_sales",
    final_marker="SELECT cs1.product_name",
    ref_prefix=("cs1", "cs2"),
    mat_where="syear IN (2000, 2000 + 1)",
    cte_where={"store_sales": "o_orderdate >= DATE '2000-01-01'"},
)


_register(
    "tpcds_q23b",
    _Q23_CTES + """
    SELECT c_last_name, c_first_name,
           CAST(sales AS DOUBLE) AS sales
    FROM (SELECT c_last_name, c_first_name,
                 SUM(CAST(CAST(cs_quantity AS DECIMAL(38,6))
                     * CAST(cs_list_price AS DECIMAL(38,6))
                     AS DECIMAL(38,6))) AS sales
          FROM catalog_sales, customer, date_dim
          WHERE d_year = 1998 + 2
            AND d_moy = 6
            AND cs_sold_date_sk = d_date_sk
            AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
            AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                        FROM best_ss_customer)
            AND cs_bill_customer_sk = c_customer_sk
          GROUP BY c_last_name, c_first_name
          UNION ALL
          SELECT c_last_name, c_first_name,
                 SUM(CAST(CAST(ws_quantity AS DECIMAL(38,6))
                     * CAST(ws_list_price AS DECIMAL(38,6))
                     AS DECIMAL(38,6))) AS sales
          FROM web_sales, customer, date_dim
          WHERE d_year = 1998 + 2
            AND d_moy = 6
            AND ws_sold_date_sk = d_date_sk
            AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
            AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                        FROM best_ss_customer)
            AND ws_bill_customer_sk = c_customer_sk
          GROUP BY c_last_name, c_first_name) t
    ORDER BY c_last_name, c_first_name, sales
    LIMIT 100
    """,
    doc="""TPC-DS q23 second statement (reference tpcds_sql/23.sql):
    the same frequent-item/best-customer gates, reported per customer
    NAME across catalog+web instead of one total — the UNION ALL keeps
    a customer's two channel rows separate exactly as the reference
    does.  Shares _Q23_CTES with tpcds_q23; same constant retarget
    (1999 -> 1998 base year, June).""",
)

_register(
    "tpcds_q24b",
    _Q24_SSALES + """
    SELECT c_last_name, c_first_name, s_store_name,
           CAST(SUM(netpaid) AS DOUBLE) AS paid
    FROM ssales
    WHERE i_color = 'chiffon'
    GROUP BY c_last_name, c_first_name, s_store_name
    HAVING CAST(SUM(netpaid) AS DOUBLE)
           > (SELECT 0.05 * (CAST(SUM(netpaid) AS DOUBLE)
                             / COUNT(netpaid))
              FROM ssales)
    ORDER BY c_last_name, c_first_name, s_store_name
    """,
    doc="""TPC-DS q24 second statement (reference tpcds_sql/24.sql):
    identical same-zip returned-purchase chain, reported for the
    second color ('chiffon' — in the derived color domain verbatim,
    as 'orchid' was for statement 1).  Shares _Q24_SSALES.""",
)

_register(
    "tpcds_q14b",
    """
    , cross_items AS (
      SELECT i_item_sk AS ss_item_sk
      FROM item,
           (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
                   iss.i_category_id AS category_id
            FROM store_sales, item iss, date_dim d1
            WHERE ss_item_sk = iss.i_item_sk
              AND ss_sold_date_sk = d1.d_date_sk
              AND d1.d_year BETWEEN 1998 AND 1998 + 2
            INTERSECT
            SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
            FROM catalog_sales, item ics, date_dim d2
            WHERE cs_item_sk = ics.i_item_sk
              AND cs_sold_date_sk = d2.d_date_sk
              AND d2.d_year BETWEEN 1998 AND 1998 + 2
            INTERSECT
            SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
            FROM web_sales, item iws, date_dim d3
            WHERE ws_item_sk = iws.i_item_sk
              AND ws_sold_date_sk = d3.d_date_sk
              AND d3.d_year BETWEEN 1998 AND 1998 + 2) x
      WHERE i_brand_id = brand_id
        AND i_class_id = class_id
        AND i_category_id = category_id
    ),
    avg_sales AS (
      SELECT CAST(SUM(amt) AS DOUBLE) / COUNT(*) AS average_sales
      FROM (SELECT CAST(CAST(ss_quantity AS DECIMAL(38,6))
                   * CAST(ss_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2
            UNION ALL
            SELECT CAST(CAST(cs_quantity AS DECIMAL(38,6))
                   * CAST(cs_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM catalog_sales, date_dim
            WHERE cs_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2
            UNION ALL
            SELECT CAST(CAST(ws_quantity AS DECIMAL(38,6))
                   * CAST(ws_list_price AS DECIMAL(38,6))
                   AS DECIMAL(38,6)) AS amt
            FROM web_sales, date_dim
            WHERE ws_sold_date_sk = d_date_sk
              AND d_year BETWEEN 1998 AND 1998 + 2) x
    ),
    wk AS (
      SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             SUM(CAST(CAST(ss_quantity AS DECIMAL(38,6))
                 * CAST(ss_list_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6))) AS sales,
             CAST(COUNT(*) AS BIGINT) AS number_sales,
             d_year
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_week_seq IN
            ((SELECT d_week_seq FROM date_dim
              WHERE d_year = 1998 + 1 AND d_moy = 12 AND d_dom = 16),
             (SELECT d_week_seq FROM date_dim
              WHERE d_year = 1998 AND d_moy = 12 AND d_dom = 16))
      GROUP BY i_brand_id, i_class_id, i_category_id, d_year
      HAVING CAST(SUM(CAST(CAST(ss_quantity AS DECIMAL(38,6))
                 * CAST(ss_list_price AS DECIMAL(38,6))
                 AS DECIMAL(38,6))) AS DOUBLE)
             > (SELECT average_sales FROM avg_sales)
    )
    SELECT this_year.channel AS ty_channel,
           this_year.i_brand_id AS ty_brand,
           this_year.i_class_id AS ty_class,
           this_year.i_category_id AS ty_category,
           CAST(this_year.sales AS DOUBLE) AS ty_sales,
           this_year.number_sales AS ty_number_sales,
           last_year.channel AS ly_channel,
           last_year.i_brand_id AS ly_brand,
           last_year.i_class_id AS ly_class,
           last_year.i_category_id AS ly_category,
           CAST(last_year.sales AS DOUBLE) AS ly_sales,
           last_year.number_sales AS ly_number_sales
    FROM (SELECT * FROM wk WHERE d_year = 1998 + 1) this_year,
         (SELECT * FROM wk WHERE d_year = 1998) last_year
    WHERE this_year.i_brand_id = last_year.i_brand_id
      AND this_year.i_class_id = last_year.i_class_id
      AND this_year.i_category_id = last_year.i_category_id
    ORDER BY this_year.channel, this_year.i_brand_id,
             this_year.i_class_id, this_year.i_category_id
    LIMIT 100
    """,
    doc="""TPC-DS q14 second statement (reference tpcds_sql/14.sql):
    the cross-channel item gate applied to ONE calendar week (Dec 16)
    compared across consecutive years, store channel.  The two
    year-leg scans are folded into one shared weekly aggregate (wk)
    filtered per year — the reference's two scalar week-seq
    subqueries become an IN over both weeks; the per-year slices are
    then self-joined.  Same derivation of d_week_seq/d_dom; decimal
    products exact; week anchor d_dom 25 -> 16 is NOT needed — the
    reference's own constant is 16 and both weeks exist in the
    derived calendar.""",
)


_register(
    "tpcds_q39b",
    f"""
    , inv AS (
      SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
             stdev, mean,
             CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
      FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
                   CAST({_STDDEV.format(c='inv_quantity_on_hand')} AS DOUBLE)
                       AS stdev,
                   {_AVG.format(c='inv_quantity_on_hand')} AS mean
            FROM inventory, item, warehouse, date_dim
            WHERE inv_item_sk = i_item_sk
              AND inv_warehouse_sk = w_warehouse_sk
              AND inv_date_sk = d_date_sk
              AND d_year = 1998
            GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
      WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 0.4
    )
    SELECT CAST(inv1.w_warehouse_sk AS BIGINT) AS wsk1,
           CAST(inv1.i_item_sk AS BIGINT) AS isk1,
           CAST(inv1.d_moy AS BIGINT) AS moy1,
           inv1.mean AS mean1, inv1.cov AS cov1,
           CAST(inv2.w_warehouse_sk AS BIGINT) AS wsk2,
           CAST(inv2.i_item_sk AS BIGINT) AS isk2,
           CAST(inv2.d_moy AS BIGINT) AS moy2,
           inv2.mean AS mean2, inv2.cov AS cov2
    FROM inv inv1, inv inv2
    WHERE inv1.i_item_sk = inv2.i_item_sk
      AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      AND inv1.d_moy = 4
      AND inv2.d_moy = 4 + 1
      AND inv1.cov > 0.6
    ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
             inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
    """,
    doc="""TPC-DS q39 second statement (reference tpcds_sql/39.sql):
    statement 1's consecutive-month coefficient-of-variation self-join
    with the additional inv1.cov > 1.5 spike filter.  Thresholds scale
    with the statement-1 retarget (base 1 -> 0.4, so the 1.5 spike
    -> 0.6): the derived inventory grid's cov tops out near 0.62, and
    the filter keeps the reference's find-the-spikiest intent.  Same
    exact-decimal stddev spelling.""",
)
