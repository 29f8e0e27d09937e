"""Sources/sinks: adapters that turn external tables into the engine's
interleaved-spans document shape, plus RDF serialization sinks."""
