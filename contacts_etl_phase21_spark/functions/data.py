"""Static lookup data for normalization.

Factual mapping tables (US state codes, ISO-3166 alpha-2 aliases,
surname particles, nickname equivalence roots, honorific/suffix sets)
matching the behavior of the reference's curated lists
(/root/reference/src/contacts_etl/normalization.py:41-229,697-735;
combine_contacts.py:44-104,189-200). On Spark these become broadcast
map lookups — never a shuffle.
"""

from __future__ import annotations

# US state / territory full name -> USPS code (normalization.py:128-181)
US_STATES = {
    "alabama": "AL", "alaska": "AK", "arizona": "AZ", "arkansas": "AR",
    "california": "CA", "colorado": "CO", "connecticut": "CT", "delaware": "DE",
    "florida": "FL", "georgia": "GA", "hawaii": "HI", "idaho": "ID",
    "illinois": "IL", "indiana": "IN", "iowa": "IA", "kansas": "KS",
    "kentucky": "KY", "louisiana": "LA", "maine": "ME", "maryland": "MD",
    "massachusetts": "MA", "michigan": "MI", "minnesota": "MN",
    "mississippi": "MS", "missouri": "MO", "montana": "MT", "nebraska": "NE",
    "nevada": "NV", "new hampshire": "NH", "new jersey": "NJ",
    "new mexico": "NM", "new york": "NY", "north carolina": "NC",
    "north dakota": "ND", "ohio": "OH", "oklahoma": "OK", "oregon": "OR",
    "pennsylvania": "PA", "rhode island": "RI", "south carolina": "SC",
    "south dakota": "SD", "tennessee": "TN", "texas": "TX", "utah": "UT",
    "vermont": "VT", "virginia": "VA", "washington": "WA",
    "west virginia": "WV", "wisconsin": "WI", "wyoming": "WY",
    "district of columbia": "DC", "dc": "DC",
}

# country alias -> ISO-3166 alpha-2 (normalization.py:41-127)
COUNTRY_ISO2 = {
    "us": "US", "usa": "US", "united states": "US",
    "united states of america": "US", "u.s.": "US", "u.s.a.": "US",
    "america": "US",
    "canada": "CA", "ca": "CA", "mexico": "MX", "mx": "MX",
    "united kingdom": "GB", "uk": "GB", "u.k.": "GB", "great britain": "GB",
    "england": "GB", "scotland": "GB", "wales": "GB", "northern ireland": "GB",
    "ireland": "IE", "republic of ireland": "IE",
    "germany": "DE", "deutschland": "DE", "de": "DE",
    "france": "FR", "fr": "FR", "italy": "IT", "it": "IT",
    "spain": "ES", "es": "ES", "portugal": "PT", "pt": "PT",
    "netherlands": "NL", "holland": "NL", "nl": "NL",
    "belgium": "BE", "be": "BE", "switzerland": "CH", "ch": "CH",
    "austria": "AT", "at": "AT", "australia": "AU", "au": "AU",
    "new zealand": "NZ", "nz": "NZ", "india": "IN", "in": "IN",
    "china": "CN", "cn": "CN", "people's republic of china": "CN",
    "prc": "CN", "japan": "JP", "jp": "JP",
    "south korea": "KR", "republic of korea": "KR", "kr": "KR",
    "brazil": "BR", "br": "BR", "argentina": "AR", "ar": "AR",
    "south africa": "ZA", "za": "ZA", "sweden": "SE", "se": "SE",
    "norway": "NO", "no": "NO", "denmark": "DK", "dk": "DK",
    "finland": "FI", "fi": "FI", "czech republic": "CZ", "czechia": "CZ",
    "cz": "CZ", "poland": "PL", "pl": "PL", "singapore": "SG", "sg": "SG",
    "hong kong": "HK", "hk": "HK", "israel": "IL", "il": "IL",
    "united arab emirates": "AE", "uae": "AE", "ae": "AE",
}

# surname particles for multi-token last names (normalization.py:183-206)
SURNAME_PARTICLES = frozenset({
    "da", "de", "del", "della", "der", "di", "la", "le", "van", "von",
    "den", "ten", "ter", "du", "st", "st.", "san", "mac", "mc",
    "o", "d", "l",
})

# nickname equivalence classes: root -> variants (normalization.py:707-735)
NICKNAME_ROOTS = {
    "william": ("will", "bill", "billy", "liam"),
    "robert": ("rob", "bob", "bobby", "robby"),
    "richard": ("rich", "rick", "ricky", "dick"),
    "edward": ("ed", "eddie", "ted", "teddy", "ned"),
    "margaret": ("meg", "maggie", "peggy"),
    "elizabeth": ("liz", "beth", "lizzy", "eliza", "liza", "betsy"),
    "katherine": ("kathy", "kate", "katie", "cathy", "cait"),
    "alexander": ("alex", "sasha"),
    "james": ("jim", "jimmy", "jamie"),
    "john": ("jack", "johnny"),
    "jonathan": ("jon", "john"),
    "joseph": ("joe", "joey"),
    "matthew": ("matt",),
    "michael": ("mike", "mikey"),
    "jeffrey": ("jeff",),
    "andrew": ("andy", "drew"),
    "steven": ("steve", "stevie"),
    "christopher": ("chris", "kit"),
    "patrick": ("pat", "paddy"),
    "nicholas": ("nick", "nicky"),
    "catherine": ("cathy", "kate", "katie"),
    "francis": ("frank", "frankie"),
}

# generational + professional suffixes, honorific prefixes
# (combine_contacts.py:44-104)
GENERATIONAL_SUFFIXES = frozenset({"jr", "sr", "ii", "iii", "iv", "v", "vi"})

PROFESSIONAL_SUFFIXES = frozenset({
    "phd", "pmp", "csm", "spc6", "ccim", "phr", "shrm", "shrmcp", "cp",
    "mba", "cissp", "crisc", "cscp", "cams", "cpa", "cfa", "pe", "cisa",
    "cism", "cfe", "cma", "ceh", "itil", "sixsigma", "leansixsigma",
    "esq", "jd", "ms", "rdn", "ld", "mpa", "ise", "md", "mph",
})

HONORIFIC_PREFIXES = frozenset({
    "mr", "mrs", "ms", "miss", "mx", "dr", "prof", "sir", "madam",
    "madame", "lady", "lord", "rev", "reverend", "fr", "father",
    "pastor", "rabbi", "imam", "hon", "judge",
})

# survivorship source priority (combine_contacts.py:189-193)
SOURCE_PRIORITY = {"linkedin": 3, "mac_vcf": 2, "gmail": 1}

# Apple address-book label tokens (combine_contacts.py:195-200)
APPLE_LABELS = {
    "_$!<work>!$_": "work",
    "_$!<home>!$_": "home",
    "_$!<other>!$_": "other",
}
