require('./patch.js');
// Behavioral-oracle runner: feed {op, input, ...opts} JSON lines on stdin,
// get the reference implementation's result as JSON lines on stdout.
const jsonld = require('/root/reference/lib/jsonld.js');

// serve preloaded "remote" docs
function makeLoader(docs) {
  return async url => {
    if (docs && url in docs) {
      return {contextUrl: null, document: docs[url], documentUrl: url};
    }
    throw new Error('loading document failed: ' + url);
  };
}

async function runOne(req) {
  const opts = Object.assign({}, req.options || {});
  if (req.documents) opts.documentLoader = makeLoader(req.documents);
  switch (req.op) {
    case 'expand':
      return jsonld.expand(req.input, opts);
    case 'compact':
      return jsonld.compact(req.input, req.ctx, opts);
    case 'flatten':
      return jsonld.flatten(req.input, req.ctx || null, opts);
    case 'toRdf':
      return jsonld.toRDF(req.input, opts);
    case 'fromRdf': {
      // input: quads in engine JSON form [[s,p,o,g] as term arrays]
      const ds = req.input.map(q => {
        const mk = t => {
          const term = {termType: t[0], value: t[1]};
          if (t[0] === 'Literal') {
            term.datatype = {termType: 'NamedNode', value: t[2]};
            if (t[3]) term.language = t[3];
          }
          return term;
        };
        return {subject: mk(q[0]), predicate: mk(q[1]), object: mk(q[2]), graph: mk(q[3])};
      });
      return jsonld.fromRDF(ds, opts);
    }
    case 'frame':
      return jsonld.frame(req.input, req.frame, opts);
    case 'frameDecycled': {
      // @embed:'@link' creates true cycles that JSON.stringify cannot
      // serialize; replace any reference back to an ANCESTOR on the
      // current path with {'@cycle': ancestor's @id} (deterministic,
      // mirrored by the python test harness)
      const res = await jsonld.frame(req.input, req.frame, opts);
      const decycle = (node, path) => {
        if (Array.isArray(node)) return node.map(x => decycle(x, path));
        if (node && typeof node === 'object') {
          if (path.has(node)) {
            return {'@cycle': node['@id'] !== undefined ? node['@id'] : true};
          }
          path.add(node);
          const out = {};
          for (const k of Object.keys(node)) out[k] = decycle(node[k], path);
          path.delete(node);
          return out;
        }
        return node;
      };
      return decycle(res, new Set());
    }
    case 'merge':
      return jsonld.merge(req.input, req.ctx || null, opts);
    case 'mergeGuarded': {
      // the fork's nodeMap @reverse path can call util.addValue with an
      // undefined subject (native TypeError); guard it so the intended
      // merge semantics are observable for differential comparison
      const util = require('/root/reference/lib/util.js');
      const orig = util.addValue;
      util.addValue = function(subject, property, value, options) {
        if (subject === undefined) return;
        return orig(subject, property, value, options);
      };
      try {
        return await jsonld.merge(req.input, req.ctx || null, opts);
      } finally {
        util.addValue = orig;
      }
    }
    default:
      throw new Error('unknown op ' + req.op);
  }
}

let buf = '';
process.stdin.on('data', d => buf += d);
process.stdin.on('end', async () => {
  const out = [];
  for (const line of buf.split('\n')) {
    if (!line.trim()) continue;
    const req = JSON.parse(line);
    try {
      const result = await runOne(req);
      out.push(JSON.stringify({ok: true, result}));
    } catch (e) {
      out.push(JSON.stringify({ok: false, error: String(e && e.message || e),
        code: e && e.details && e.details.code}));
    }
  }
  process.stdout.write(out.join('\n') + '\n');
});
