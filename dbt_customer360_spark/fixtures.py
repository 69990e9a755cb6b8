"""Deterministic customer-360 source fixtures (FIXTURES.md §2).

Synthesizes the three connector tables the reference reads —
marketo leads, stripe customer overview, zendesk users/orgs — with
controlled identity overlap and the messy values the cleaning layer
must handle: titled/suffixed names, 'Last, First' order, phone
punctuation/extensions, street abbreviations, secondary units, state
codes vs longform, '#REF!' garbage, 'NA' phones, empty strings.

Identity plan (person p in 0..n-1):
- marketo row for p if p % 3 != 2
- stripe row for p if p % 2 == 0
- zendesk row for p if p % 5 != 4
- p % 7 == 0  -> email missing in stripe (match must come from phone+name)
- p % 11 == 0 -> name fuzzed below the .95 threshold in stripe
  (match must come from email)
- p % 13 == 0 -> transitivity probe: marketo&stripe share email only,
  stripe&zendesk share phone only (marketo-zendesk edge is indirect)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from dbt_customer360_spark.session import local_df

FIRST = ["James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
         "Linda", "William", "Elizabeth", "David", "Barbara", "Richard", "Susan"]
LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
        "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez"]
TITLES = ["", "Dr ", "Mr ", "Ms ", "Prof "]
SUFFIX = ["", " Jr", " Sr", " iii"]
COMPANIES = ["Acme Inc", "Globex Corp", "Initech Llc", "Umbrella Gmbh",
             "Stark Industries", "Wayne Enterprises Ltd", "Hooli", "Pied Piper Co"]
STREETS = ["Main St", "Oak Ave", "Cedar Blvd", "Elm Dr", "Pine Ln", "Lake Rd"]
CITIES = ["Springfield", "Rivertown", "Lakeside", "Hillview", "Brookfield"]
STATES = [("CA", "California"), ("NY", "New York"), ("TX", "Texas"),
          ("WA", "Washington"), ("IL", "Illinois")]


def _ts(p: int, source_shift: int) -> dt.datetime:
    return dt.datetime(2023, 1, 1) + dt.timedelta(hours=p * 7 + source_shift)


def _person(p: int) -> dict:
    first = FIRST[p % len(FIRST)]
    last = LAST[p % len(LAST)]
    sc, sl = STATES[p % len(STATES)]
    return {
        "first": first,
        "last": last,
        "email": f"{first.lower()}.{last.lower()}{p}@example.com",
        "phone_digits": f"55501{p:05d}",
        "company": COMPANIES[p % len(COMPANIES)],
        "street": f"{100 + p} {STREETS[p % len(STREETS)]}",
        "city": CITIES[p % len(CITIES)],
        "state_code": sc,
        "state_long": sl,
        "postal": f"{90000 + p:05d}",
    }


def marketo_leads(spark: SparkSession, n: int = 120) -> DataFrame:
    rows = []
    for p in range(n):
        if p % 3 == 2:
            continue
        q = _person(p)
        title = TITLES[p % len(TITLES)]
        suffix = SUFFIX[p % len(SUFFIX)]
        rows.append(
            (
                p,
                q["email"],
                f"{title}{q['first']}",
                f"{q['last']}{suffix}",
                q["company"],
                q["company"] if p % 4 == 0 else None,
                f"({q['phone_digits'][:3]}) {q['phone_digits'][3:6]}-{q['phone_digits'][6:]}",
                None if p % 6 else f"{q['phone_digits']}#12",
                None,
                q["street"] + (" Apt 4" if p % 5 == 0 else ""),
                q["city"],
                "#REF!" if p % 17 == 0 else q["state_long"],
                "United States",
                q["postal"],
                q["street"],
                q["city"],
                q["state_code"],
                "US",
                q["postal"],
                f"10.0.{p % 256}.{(p * 7) % 256}" if p % 3 == 0 else None,
                p % 9 == 0,
                False,
                p % 10 == 0,
                _ts(p, 1),
                _ts(p, 0),
                10 * p,
                3 * p,
            )
        )
    return local_df(spark,
        
        rows,
        "lead_id long, email string, first_name string, last_name string, "
        "company string, inferred_company string, phone string, "
        "company_phone string, mobile_phone string, address string, "
        "city string, state string, country string, postal_code string, "
        "billing_street string, billing_city string, billing_state string, "
        "billing_country string, billing_postal_code string, "
        "anonymous_ip string, is_unsubscribed boolean, is_email_invalid boolean, "
        "do_not_call boolean, updated_timestamp timestamp, created_timestamp timestamp, "
        "count_sends long, count_opens long",
    )


def stripe_customers(spark: SparkSession, n: int = 120) -> DataFrame:
    rows = []
    for p in range(n):
        if p % 2 != 0:
            continue
        q = _person(p)
        name = f"{q['first']} {q['last']}"
        if p % 11 == 0:
            # fuzz well below the .95 similarity threshold
            name = f"{q['first'][:3]}xx {q['last'][::-1]}"
        if p % 8 == 0:
            name = f"{q['last']}, {q['first']}"  # 'Last, First'
        email = None if p % 7 == 0 else q["email"]
        rows.append(
            (
                f"cus_{p:05d}",
                email,
                name,
                f"{q['company']} ({name})" if p % 9 == 0 else name,
                f"+1-{q['phone_digits'][:3]}-{q['phone_digits'][3:6]}-{q['phone_digits'][6:]}",
                "" if p % 4 else q["phone_digits"],
                q["street"],
                "Suite 9" if p % 6 == 0 else None,
                q["city"],
                q["state_code"] if p % 2 == 0 else q["state_long"],
                "US",
                q["postal"],
                q["street"],
                None,
                q["city"],
                q["state_long"],
                "United States",
                q["postal"],
                p % 12 == 0,
                p % 20 == 0,
                _ts(p, 2),
                float(100 * p),
                float(p),
                p // 2,
                _ts(p, 3),
            )
        )
    return local_df(spark,
        
        rows,
        "customer_id string, email string, customer_name string, "
        "shipping_name string, phone string, shipping_phone string, "
        "customer_address_line_1 string, customer_address_line_2 string, "
        "customer_address_city string, customer_address_state string, "
        "customer_address_country string, customer_address_postal_code string, "
        "shipping_address_line_1 string, shipping_address_line_2 string, "
        "shipping_address_city string, shipping_address_state string, "
        "shipping_address_country string, shipping_address_postal_code string, "
        "is_delinquent boolean, is_deleted boolean, customer_created_at timestamp, "
        "total_sales double, total_refunds double, total_sales_count long, "
        "most_recent_sale_date timestamp",
    )


def zendesk_users(spark: SparkSession, n: int = 120) -> DataFrame:
    rows = []
    for p in range(n):
        if p % 5 == 4:
            continue
        q = _person(p)
        email = q["email"]
        if p % 13 == 0:
            email = f"other{p}@example.net"  # transitivity probe: no email edge
        rows.append(
            (
                1000 + p,
                (p % len(COMPANIES)) + 1 if p % 2 == 0 else None,
                email,
                f"{q['first']} {q['last']}",
                "NA" if p % 10 == 0 else q["phone_digits"],
                "end-user" if p % 16 != 15 else "agent",
                True,
                p % 19 == 0,
                _ts(p, 4),
                _ts(p, 3),
            )
        )
    return local_df(spark,
        
        rows,
        "user_id long, organization_id long, email string, name string, "
        "phone string, role string, is_active boolean, is_suspended boolean, "
        "updated_at timestamp, created_at timestamp",
    )


def zendesk_ticket_metrics(spark: SparkSession, n: int = 120) -> DataFrame:
    """Per-user ticket KPIs (the zendesk__customer_metrics analog the
    reference's customer table consumes, customer360__customer.sql:80-107):
    counts plus per-user averages — all deterministic in p; every 7th
    user has zero created tickets so the weighted average's
    safe_divide NULL path is exercised."""
    rows = []
    for p in range(n):
        if p % 5 == 4:
            continue
        created = 0 if p % 7 == 0 else (p % 13) + 1
        resolved = max(created - (p % 3), 0)
        rows.append(
            (
                1000 + p,
                created,
                resolved,
                p % 4,
                float((p % 5) + 1) if created else None,
                float(30 + (p * 11) % 240) if created else None,
                float(120 + (p * 17) % 960) if resolved else None,
                float((p % 3) + 3) if resolved else None,
            )
        )
    return local_df(spark,
        
        rows,
        "user_id long, count_created_tickets long, count_resolved_tickets long, "
        "count_reopened_tickets long, avg_ticket_priority double, "
        "avg_first_reply_time_calendar_minutes double, "
        "avg_first_resolution_calendar_minutes double, "
        "avg_ticket_satisfaction_score double",
    )


def zendesk_organizations(spark: SparkSession) -> DataFrame:
    rows = [
        (i + 1, c, _ts(i, 6), _ts(i, 5)) for i, c in enumerate(COMPANIES)
    ]
    return local_df(spark,
        
        rows,
        "organization_id long, name string, updated_at timestamp, created_at timestamp",
    )
