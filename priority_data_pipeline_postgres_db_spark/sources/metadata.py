"""OData ``$metadata`` EDMX → schema registry.

Driver-side parser with the semantics of the reference's metadata harvest
(reference: priorityDataSource.py:336-447):

- walk ``edmx:Edmx → edmx:DataServices → Schema → EntityType``
  (priorityDataSource.py:358),
- per entity capture description (``Annotation/@String``, :372-375), key
  fields (``Key/PropertyRef`` — single-dict and list shapes, :379-388), and
  per-field name / EDM type / description / KeyFlag (:392-420 with the
  single-field special case :409-420),
- derive an ``EntityPk`` list of all key-flagged fields (:441-444),
- enrich each field with the mapped target type
  (priorityDataSource.py:528-542; unmatched → None).

Output docs follow the reference's metadata-doc shape (readme.md:518-551):
``{_id, sourceSystem, desc?, Fields: [...], EntityPk}``.  ``to_struct``
turns a doc into the Spark ``StructType`` the ingest layer uses.

Uses ``xml.etree`` (stdlib) — no xmltodict dependency.
"""

from __future__ import annotations

import json
import re
from xml.etree import ElementTree

from pyspark.sql import types as T

from ..functions.typemap import entity_struct, lookup_target_name

_TAG = re.compile(r"\{.*\}")


def _local(tag: str) -> str:
    return _TAG.sub("", tag)


def parse_edmx(edmx_xml: str, *, source_system: str = "priority") -> list[dict]:
    """Parse an EDMX document into a list of entity metadata docs."""
    root = ElementTree.fromstring(edmx_xml)
    entities: list[dict] = []
    for et in root.iter():
        if _local(et.tag) != "EntityType":
            continue
        name = et.attrib.get("Name", "")
        doc: dict = {"_id": name, "sourceSystem": source_system}
        key_fields: set[str] = set()
        fields: list[dict] = []
        for child in et:
            tag = _local(child.tag)
            if tag == "Key":
                for ref in child:
                    if _local(ref.tag) == "PropertyRef":
                        key_fields.add(ref.attrib["Name"])
            elif tag == "Annotation":
                # entity-level description (priorityDataSource.py:372-375)
                if child.attrib.get("String"):
                    doc["desc"] = child.attrib["String"]
            elif tag == "Property":
                field = {
                    "fieldName": child.attrib["Name"],
                    "SourceDataType": child.attrib.get("Type", "Edm.String"),
                    "KeyFlag": child.attrib["Name"] in key_fields,
                }
                for ann in child:
                    if _local(ann.tag) == "Annotation" and ann.attrib.get("String"):
                        field["desc"] = ann.attrib["String"]
                fields.append(field)
        # Key element may appear after properties in arbitrary EDMX; re-flag.
        for f in fields:
            f["KeyFlag"] = f["fieldName"] in key_fields
            f["targetDataType"] = lookup_target_name(source_system, f["SourceDataType"])
        doc["Fields"] = fields
        doc["EntityPk"] = [f["fieldName"] for f in fields if f["KeyFlag"]]
        entities.append(doc)
    return entities


def to_struct(entity_doc: dict, *, with_audit: bool = True) -> T.StructType:
    """Entity metadata doc → landing StructType (PK→string, audit cols)."""
    return entity_struct(
        entity_doc["Fields"],
        source_system=entity_doc.get("sourceSystem", "priority"),
        with_audit=with_audit,
    )


class SchemaRegistry:
    """In-memory registry of entity metadata docs, JSON-persistable.

    Replaces the reference's MongoDB metadata collection (the reference
    re-queries Mongo three times per entity per run,
    priorityDataSource.py:754,767,768 — here the registry loads once).
    """

    def __init__(self, docs: list[dict] | None = None):
        self._docs: dict[str, dict] = {d["_id"]: d for d in (docs or [])}

    @classmethod
    def from_edmx(cls, edmx_xml: str, *, source_system: str = "priority") -> "SchemaRegistry":
        return cls(parse_edmx(edmx_xml, source_system=source_system))

    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        with open(path) as fh:
            return cls(json.load(fh))

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(list(self._docs.values()), fh, indent=1, default=str)

    def __len__(self) -> int:
        return len(self._docs)

    def __contains__(self, entity: str) -> bool:
        return entity in self._docs

    def doc(self, entity: str) -> dict:
        return self._docs[entity]

    def entities(self) -> list[str]:
        return sorted(self._docs)

    def pk(self, entity: str) -> list[str]:
        """EntityPk list (priorityDataSource.py:441-444), lowercased."""
        return [c.lower() for c in self._docs[entity]["EntityPk"]]

    def struct(self, entity: str, *, with_audit: bool = True) -> T.StructType:
        return to_struct(self._docs[entity], with_audit=with_audit)

    def upsert(self, doc: dict) -> None:
        self._docs[doc["_id"]] = doc
