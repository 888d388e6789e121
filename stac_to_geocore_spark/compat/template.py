"""The GeoCore null-template feature.

The reference fetches `geocore-format-null-template.json` from S3 per record
(app.py:122,150) and mutates `features[0]` in place. The template file is not
in the reference repo; its schema is fully inferable from the mutation sites
(SURVEY.md §1.3). This module defines the canonical template used by both
the engine and the golden-test oracle — key insertion order here IS the
output JSON key order (json.dumps preserves dict order), so it is part of
the byte-for-byte contract.

Engine difference from the reference: the template is materialized once and
broadcast (the reference re-fetches it from S3 for every record).
"""

from __future__ import annotations

import copy


def _bil(val=None):
    return {"en": val, "fr": val}


NULL_TEMPLATE_FEATURE = {
    "geometry": {
        "type": None,
        "coordinates": None,
    },
    "properties": {
        "id": None,
        "title": _bil(),
        "description": _bil(),
        "keywords": _bil(),
        "topicCategory": None,
        "parentIdentifier": None,
        "date": {
            "published": {"text": None, "date": None},
            "created": {"text": None, "date": None},
        },
        "spatialRepresentation": None,
        "type": None,
        "geometry": None,
        "temporalExtent": {"begin": None, "end": None},
        "refSys": None,
        "refSys_version": None,
        "status": None,
        "maintenance": None,
        "metadataStandard": _bil(),
        "metadataStandardVersion": None,
        "graphicOverview": None,
        "distributionFormat_name": None,
        "distributionFormat_format": None,
        "useLimits": _bil(),
        "accessConstraints": None,
        "otherConstraints": _bil(),
        "dateStamp": None,
        "dataSetURI": None,
        "locale": None,
        "language": None,
        "characterSet": None,
        "environmentDescription": None,
        "supplementalInformation": _bil(),
        "contact": None,
        "credits": None,
        "cited": None,
        "distributor": None,
        "options": None,
        "sourceSystemName": None,
    },
}


def null_template() -> dict:
    """Fresh deep copy (the reference re-reads from S3 to get the same effect)."""
    return copy.deepcopy(NULL_TEMPLATE_FEATURE)
