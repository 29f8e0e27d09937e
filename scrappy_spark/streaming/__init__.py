"""Streaming layer: observe-mode periodic re-crawl (the reference's only
'streaming' operator, agent.rb:140-151) plus Structured-Streaming
consumption of the engine's append-only state tables."""
