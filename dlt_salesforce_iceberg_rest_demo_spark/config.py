"""Per-resource pipeline policy (I2): the reference's 15 resources with
their write dispositions, primary keys, and incremental cursors -
/root/reference/salesforce/__init__.py:31-148 verbatim.

- replace resources are full snapshots every run;
- merge resources upsert on `Id` with a strict-`>` cursor;
- task/event are declared merge but carry no primary key -> the writer's
  W4 fallback appends with a warning (salesforce_pipeline.py:131-138).
"""

from __future__ import annotations

from dataclasses import dataclass

EPOCH_INITIAL = "2000-01-01T00:00:00Z"


@dataclass(frozen=True)
class ResourceConfig:
    name: str                      # snake_case table name (dlt-normalized)
    sobject: str                   # Salesforce object name
    write_disposition: str         # append | replace | merge
    primary_key: tuple[str, ...] = ()
    replication_key: str | None = None
    initial_value: str | None = None


RESOURCES: dict[str, ResourceConfig] = {
    r.name: r
    for r in [
        # __init__.py:31-37
        ResourceConfig("sf_user", "User", "replace"),
        ResourceConfig("user_role", "UserRole", "replace"),
        # __init__.py:39-70 - merge on Id, cursor SystemModstamp
        ResourceConfig(
            "opportunity", "Opportunity", "merge", ("Id",), "SystemModstamp", EPOCH_INITIAL
        ),
        ResourceConfig(
            "opportunity_line_item",
            "OpportunityLineItem",
            "merge",
            ("Id",),
            "SystemModstamp",
            EPOCH_INITIAL,
        ),
        ResourceConfig(
            "opportunity_contact_role",
            "OpportunityContactRole",
            "merge",
            ("Id",),
            "SystemModstamp",
            EPOCH_INITIAL,
        ),
        # __init__.py:72-80 - account merges on LastModifiedDate
        ResourceConfig(
            "account", "Account", "merge", ("Id",), "LastModifiedDate", EPOCH_INITIAL
        ),
        # __init__.py:82-92 replace set
        ResourceConfig("contact", "Contact", "replace"),
        ResourceConfig("lead", "Lead", "replace"),
        ResourceConfig("campaign", "Campaign", "replace"),
        # __init__.py:94-102 - campaign_member merge on Id
        ResourceConfig(
            "campaign_member",
            "CampaignMember",
            "merge",
            ("Id",),
            "SystemModstamp",
            EPOCH_INITIAL,
        ),
        # __init__.py:104-114 replace set
        ResourceConfig("product_2", "Product2", "replace"),
        ResourceConfig("pricebook_2", "Pricebook2", "replace"),
        ResourceConfig("pricebook_entry", "PricebookEntry", "replace"),
        # __init__.py:116-130 - task/event: merge with NO primary key and
        # no initial cursor value (cursor starts at None).
        ResourceConfig("task", "Task", "merge", (), "SystemModstamp", None),
        ResourceConfig("event", "Event", "merge", (), "SystemModstamp", None),
    ]
}

# Default resource selection (salesforce_pipeline.py:35-37).
DEFAULT_RESOURCES = ("account", "contact", "opportunity", "opportunity_contact_role")
