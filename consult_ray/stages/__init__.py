"""map_batches stage callables. Stateless stages are module-level
functions (cheap elastic tasks); stateful stages are callable classes run
as actor pools (setup in __init__, work in __call__)."""
