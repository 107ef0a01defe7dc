// The fork stripped rdf-canonize; re-provide the removed public
// IdentifierIssuer API (first-seen-order counter) for the oracle runs.
const util = require('/root/reference/lib/util.js');
class IdentifierIssuer {
  constructor(prefix) { this.prefix = prefix; this.counter = 0; this.existing = new Map(); }
  clone() { const c = new IdentifierIssuer(this.prefix); c.counter = this.counter; c.existing = new Map(this.existing); return c; }
  getId(old) {
    if (old && this.existing.has(old)) return this.existing.get(old);
    const identifier = this.prefix + (this.counter++);
    if (old) this.existing.set(old, identifier);
    return identifier;
  }
  hasId(old) { return this.existing.has(old); }
  getOldIds() { return [...this.existing.keys()]; }
}
util.IdentifierIssuer = IdentifierIssuer;
// lib/jsonld.js:800 and lib/frame.js:43 reference IdentifierIssuer as a
// bare identifier (import removed by the fork) — resolve it via global.
global.IdentifierIssuer = IdentifierIssuer;
