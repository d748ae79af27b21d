"""Source fidelity tests (S1-S3, P1-P6, T1/T2, auth) against the mock
transport - the reference's subtle correctness surface per SURVEY §7."""

from __future__ import annotations

import datetime

import pytest

from dlt_salesforce_iceberg_rest_demo_spark.sources.salesforce import (
    BulkNotEnabledError,
    SalesforceAuth,
    build_soql,
    object_meta,
    read_object,
    read_object_distributed,
)

from .fixtures_salesforce import make_transport


class TestSOQL:
    def test_projection_only(self):
        q = build_soql("User", ["Id", "Name"])
        assert q == "SELECT Id, Name FROM User"

    def test_cursor_predicate_and_order(self):
        q = build_soql(
            "Opportunity",
            ["Id"],
            replication_key="SystemModstamp",
            last_state="2024-01-01T00:00:00.000000Z",
        )
        # strict `>` + ASC order (records.py:87-91)
        assert q == (
            "SELECT Id FROM Opportunity WHERE SystemModstamp > "
            "2024-01-01T00:00:00.000000Z ORDER BY SystemModstamp ASC"
        )

    def test_replication_key_without_state_orders_only(self):
        q = build_soql("Opportunity", ["Id"], replication_key="SystemModstamp")
        assert "WHERE" not in q and "ORDER BY SystemModstamp ASC" in q

    def test_test_mode_limit(self):
        # IS_PRODUCTION=False appends LIMIT 100 (records.py:93-94)
        q = build_soql("User", ["Id"], is_production=False)
        assert q.endswith("LIMIT 100")


class TestDescribe:
    def test_compound_parent_pruned_children_kept(self):
        meta = object_meta(make_transport(), "Account")
        assert "BillingAddress" not in meta.fields  # compound parent dropped
        assert "BillingCity" in meta.fields  # leaf kept
        assert "Name" in meta.fields  # Name always kept

    def test_date_fields_detected(self):
        meta = object_meta(make_transport(), "Account")
        assert meta.date_fields == {"CreatedDate", "LastModifiedDate", "SystemModstamp"}


class TestReadObject:
    def test_bulk_read_types_and_envelope(self, spark):
        df = read_object(spark, make_transport(), "Account")
        assert "attributes" not in df.columns  # P6 envelope strip
        assert "BillingAddress" not in df.columns
        rows = {r["Id"]: r for r in df.collect()}
        assert len(rows) == 2
        # T1: bulk epoch-millis became a native UTC timestamp
        assert rows["001A"]["LastModifiedDate"] == datetime.datetime(2024, 1, 2)
        # widened numeric types (int -> long, currency -> double)
        dtypes = dict(df.dtypes)
        assert dtypes["NumberOfEmployees"] == "bigint"
        assert dtypes["AnnualRevenue"] == "double"

    def test_standard_fallback_equals_bulk(self, spark):
        bulk = read_object(spark, make_transport(), "Account")
        t = make_transport(bulk_enabled=False)
        standard = read_object(spark, t, "Account")
        # S2: FeatureNotEnabled falls back to query/query_more, identical rows
        assert sorted(map(tuple, bulk.collect())) == sorted(
            map(tuple, standard.collect())
        )

    def test_bulk_not_enabled_surface(self):
        t = make_transport(bulk_enabled=False)
        with pytest.raises(BulkNotEnabledError):
            next(iter(t.query_bulk("Account", "SELECT Id FROM Account")))

    def test_incremental_cursor_pushdown(self, spark):
        t = make_transport()
        df = read_object(
            spark,
            t,
            "Account",
            last_state="2024-01-02T00:00:00.000000Z",
            replication_key="LastModifiedDate",
        )
        # strict `>`: the row AT the cursor is excluded
        assert [r["Id"] for r in df.collect()] == ["001B"]
        assert "WHERE LastModifiedDate >" in t.queries_seen[-1]

    def test_distributed_read_matches_single(self, spark):
        single = read_object(spark, make_transport(), "Account")
        dist = read_object_distributed(
            spark, make_transport, "Account", num_partitions=4
        )
        s = sorted((r["Id"], r["Name"], r["LastModifiedDate"]) for r in single.collect())
        d = sorted((r["Id"], r["Name"], r["LastModifiedDate"]) for r in dist.collect())
        assert s == d

    def test_distributed_read_partitions_disjoint(self, spark):
        dist = read_object_distributed(
            spark, make_transport, "Account", num_partitions=8
        )
        ids = [r["Id"] for r in dist.collect()]
        assert sorted(ids) == ["001A", "001B"]  # no dup, no loss across ranges


class TestAuth:
    def test_security_token_mode(self):
        a = SalesforceAuth(user_name="u", password="p", security_token="t")
        assert a.mode() == "security_token"
        assert a.client_kwargs()["security_token"] == "t"

    def test_organization_id_mode(self):
        a = SalesforceAuth(user_name="u", password="p", organization_id="o")
        assert a.mode() == "organization_id"

    def test_consumer_key_secret_mode(self):
        a = SalesforceAuth(
            user_name="u", password="p", consumer_key="k", consumer_secret="s"
        )
        assert a.mode() == "consumer_key_secret"

    def test_jwt_mode_requires_key(self):
        a = SalesforceAuth(user_name="u", consumer_key="k", privatekey="pem")
        assert a.mode() == "jwt"

    def test_client_credentials_mode(self):
        a = SalesforceAuth(consumer_key="k", consumer_secret="s", domain="test")
        assert a.mode() == "client_credentials"

    def test_instance_requires_url(self):
        # client.py:70-76 on_resolved validation
        with pytest.raises(ValueError):
            SalesforceAuth(session_id="sid").mode()
        assert SalesforceAuth(session_id="sid", instance="na1").mode() == "instance"

    def test_no_credentials_rejected(self):
        with pytest.raises(ValueError):
            SalesforceAuth().mode()
