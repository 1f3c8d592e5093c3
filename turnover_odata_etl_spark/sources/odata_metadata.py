"""OData ``$metadata`` (EDMX/CSDL) schema discovery — pure Python.

The reference discovers fields by probing candidate ``$select`` names
and parsing 404 bodies (reference: src/etl.py:100-121 — the behavior
[S3] mirrored by ``ODataClient.probe_field``). That works for the two
fields it needs but is O(candidates) requests and yields no types. The
protocol-complete alternative every OData service must expose is the
``$metadata`` document: one GET returning an EDMX/CSDL XML description
of every entity set, its entity type, and each property's EDM type and
nullability.

This module parses that document with stdlib ElementTree only (it runs
driver-side during schema resolution — before any Spark job — but the
no-dependency rule of the sources package still applies). Both CSDL
namespace generations are handled by matching on *local* element names
(``{*}`` wildcard): OData V2 services ship
``http://schemas.microsoft.com/ado/2008/09/edm`` (and 2006/2007/2009
variants), V4 ships ``http://docs.oasis-open.org/odata/ns/edm``.

Scale note: the metadata document is one request of KBs — the schema
becomes available without touching a single data row, so a 100-TB
ingest plans its partitions and projections before the first data GET.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

__all__ = ["EdmProperty", "parse_edmx", "edm_to_spark_ddl", "EDM_TO_SPARK"]


@dataclass(frozen=True)
class EdmProperty:
    name: str
    edm_type: str  # e.g. "Edm.Int32"
    nullable: bool = True


# EDM primitive → Spark SQL DDL type. Unknown/complex types fall back
# to string (OData V2 serializes most scalars as JSON strings anyway;
# the connector's readers coerce to the declared type).
EDM_TO_SPARK = {
    "Edm.String": "string",
    "Edm.Guid": "string",
    "Edm.Time": "string",
    "Edm.TimeOfDay": "string",
    "Edm.Duration": "string",
    "Edm.Boolean": "boolean",
    "Edm.SByte": "tinyint",
    "Edm.Byte": "smallint",  # unsigned 8-bit needs the wider signed type
    "Edm.Int16": "smallint",
    "Edm.Int32": "int",
    "Edm.Int64": "bigint",
    "Edm.Single": "float",
    "Edm.Double": "double",
    "Edm.Date": "date",
    "Edm.DateTime": "timestamp",
    "Edm.DateTimeOffset": "timestamp",
    "Edm.Binary": "binary",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_edmx(xml_text: str) -> dict[str, list[EdmProperty]]:
    """EDMX document → ``{entity_set_name: [EdmProperty, ...]}``.

    Resolution chain: EntityContainer/EntitySet ``EntityType`` refs
    (namespace- or alias-qualified — the last dotted segment is the
    type's local name) → Schema/EntityType property lists. Entity sets
    whose type the document doesn't define (e.g. references into
    another schema file) are silently omitted — callers fall back to
    the probe path.
    """
    root = ET.fromstring(xml_text)

    types: dict[str, list[EdmProperty]] = {}
    for et in root.iter():
        if _local(et.tag) != "EntityType":
            continue
        props = [
            EdmProperty(
                name=p.get("Name", ""),
                edm_type=p.get("Type", "Edm.String"),
                nullable=p.get("Nullable", "true").lower() != "false",
            )
            for p in et
            if _local(p.tag) == "Property" and p.get("Name")
        ]
        if et.get("Name"):
            types[et.get("Name")] = props

    sets: dict[str, list[EdmProperty]] = {}
    for es in root.iter():
        if _local(es.tag) != "EntitySet":
            continue
        name, type_ref = es.get("Name"), es.get("EntityType", "")
        local_type = type_ref.rsplit(".", 1)[-1]
        if name and local_type in types:
            sets[name] = types[local_type]
    return sets


def edm_to_spark_ddl(props: list[EdmProperty]) -> str:
    """Property list → Spark DDL schema string.

    ``Edm.Decimal`` keeps no precision here (the EDMX attributes ride
    on the Property element, not the type string, and V2 services lie
    about them often enough that double is the safer landing) — map it
    explicitly before calling if exact decimals matter.
    """
    cols = []
    for p in props:
        spark_t = (
            "double" if p.edm_type.startswith("Edm.Decimal")
            else EDM_TO_SPARK.get(p.edm_type, "string")
        )
        cols.append(f"`{p.name}` {spark_t}")
    return ", ".join(cols)
