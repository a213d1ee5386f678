"""Source loaders: LinkedIn CSV (declarative projection), Gmail CSV
(dynamic column families via mapInPandas), vCard 3.0 (custom text-block
source via lineSep split + mapInPandas), plus union + export sinks."""
