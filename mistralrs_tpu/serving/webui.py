"""Built-in web chat UI — the analog of the reference's web chat app
(`mistralrs-cli/webui/`, Svelte SPA with ~20 components,
`webui/src/lib/components/`), served as a single static page at ``/`` that
talks to the OpenAI-compatible API with streaming (SSE) responses.

Feature parity with the reference app's surfaces (no build step — one
self-contained document):

* **streaming chat** via ``/v1/chat/completions`` (``stream: true``)
* **message-branch editing**: any user message can be edited in place; the
  old continuation is kept as a branch and a ◀ n/m ▶ switcher flips
  between alternative continuations at that point
* **reasoning display**: ``<think>…</think>`` spans (and the
  ``reasoning_content`` field) render as a collapsible dim block
* **tools panel** (ToolsPanel.svelte analog): JSON tool definitions ride
  every request; streamed ``tool_calls`` render as call blocks
* **agent sessions + approvals** (AgentApproval.svelte analog): lists
  ``/v1/agent/sessions``, shows a session's transcript, and drives
  ``POST /v1/agent/sessions/{sid}/approve``
* **code-exec output display** (CodeExecution.svelte analog): tool-role
  messages and ``` blocks in agent transcripts render as terminal panes
* **image attach** (data-URI ``image_url`` parts; zero-egress)
* **settings panel** (SettingsPanel.svelte analog): system prompt, top-p,
  top-k, penalties
* **model bar**: model list + load/unload against ``/v1/models``
* **file browsing**: ``/v1/files`` with click-to-view content
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>mistralrs-tpu chat</title>
<style>
  :root { --bg:#101418; --panel:#1a2027; --text:#e6e9ed; --dim:#8b949e;
          --accent:#4f8cc9; --user:#24303d; --asst:#1d242c; --ok:#3fb950;
          --warn:#d29922; }
  * { box-sizing: border-box; }
  body { margin:0; background:var(--bg); color:var(--text);
         font:15px/1.5 system-ui, sans-serif; display:flex;
         flex-direction:column; height:100vh; }
  header { padding:10px 16px; background:var(--panel); display:flex;
           gap:12px; align-items:center; flex-wrap:wrap; }
  header h1 { font-size:15px; margin:0; font-weight:600; }
  header select, header input[type=number] {
    background:var(--bg); color:var(--text); border:1px solid #333;
    border-radius:6px; padding:4px 8px; }
  header label { color:var(--dim); font-size:12px; }
  header button { background:none; border:1px solid #333; color:var(--dim);
    border-radius:6px; padding:4px 10px; font-size:12px; cursor:pointer; }
  header button.active, header button:hover { color:var(--text);
    border-color:var(--accent); }
  #main { flex:1; display:flex; min-height:0; }
  #log { flex:1; overflow-y:auto; padding:16px; }
  aside { width:0; overflow:hidden; transition:width .15s;
          background:var(--panel); border-left:1px solid #222; }
  aside.open { width:360px; overflow-y:auto; padding:10px; }
  aside h2 { font-size:12px; color:var(--dim); margin:8px 0 4px;
             text-transform:uppercase; letter-spacing:.05em; }
  .file-row, .sess-row { padding:6px 8px; border-radius:6px; cursor:pointer;
              font-size:13px; }
  .file-row:hover, .sess-row:hover { background:var(--user); }
  #fileview, .termpane { white-space:pre-wrap;
              font:12px/1.4 ui-monospace, monospace;
              background:var(--bg); border-radius:8px; padding:8px;
              margin-top:8px; max-height:50vh; overflow-y:auto; }
  .termpane { border-left:3px solid var(--ok); margin:6px auto;
              max-width:46em; }
  .toolcall { max-width:46em; margin:6px auto; padding:8px 12px;
              border-radius:8px; background:#14202b;
              border-left:3px solid var(--warn);
              font:13px/1.5 ui-monospace, monospace; white-space:pre-wrap; }
  .msg { max-width:46em; margin:0 auto 12px; padding:10px 14px;
         border-radius:10px; white-space:pre-wrap; position:relative; }
  .user { background:var(--user); }
  .assistant { background:var(--asst); }
  .msg img.attach { max-width:200px; display:block; border-radius:8px;
                    margin-top:6px; }
  .role { font-size:11px; color:var(--dim); margin:0 auto 2px;
          max-width:46em; padding:0 4px; display:flex; gap:8px;
          align-items:center; }
  .role .spacer { flex:1; }
  .role button { background:none; border:0; color:var(--dim); padding:0 4px;
                 font-size:11px; cursor:pointer; }
  .role button:hover { color:var(--text); }
  details.think { max-width:46em; margin:0 auto 6px; color:var(--dim);
                  font-size:13px; }
  details.think pre { white-space:pre-wrap; margin:4px 0 0;
                      border-left:2px solid #333; padding-left:10px;
                      font:13px/1.4 inherit; }
  .edit-box, .json-box { width:100%; background:var(--bg); color:var(--text);
              border:1px solid #444; border-radius:6px; padding:6px;
              font:13px/1.4 ui-monospace, monospace; }
  .json-box { min-height:10em; resize:vertical; }
  #settings label { display:block; font-size:12px; color:var(--dim);
                    margin-top:8px; }
  #settings input, #settings textarea { width:100%; background:var(--bg);
      color:var(--text); border:1px solid #333; border-radius:6px;
      padding:4px 8px; font:inherit; }
  footer { padding:12px 16px; background:var(--panel); }
  form { display:flex; gap:8px; max-width:48em; margin:0 auto;
         align-items:flex-end; }
  textarea#q { flex:1; resize:none; background:var(--bg); color:var(--text);
             border:1px solid #333; border-radius:8px; padding:8px 10px;
             font:inherit; height:3.2em; }
  button.primary { background:var(--accent); color:#fff; border:0;
           border-radius:8px; padding:8px 18px; font:inherit;
           cursor:pointer; }
  button.primary:disabled { opacity:.5; cursor:default; }
  #attach-preview { display:flex; gap:6px; max-width:48em;
                    margin:0 auto 6px; }
  #attach-preview img { height:48px; border-radius:6px; }
  #stats { color:var(--dim); font-size:12px; margin-left:auto; }
  .badge { font-size:11px; border-radius:10px; padding:1px 8px;
           background:var(--user); color:var(--dim); }
  .approve-btn { background:var(--ok); color:#fff; border:0;
                 border-radius:6px; padding:3px 10px; font-size:12px;
                 cursor:pointer; margin-left:6px; }
</style>
</head>
<body>
<header>
  <h1>mistralrs-tpu</h1>
  <select id="model"></select>
  <span id="modelinfo" class="badge"></span>
  <label>temp <input id="temp" type="number" min="0" max="2" step="0.1"
                     value="0.7" style="width:4.5em"></label>
  <label>max <input id="maxtok" type="number" min="1" max="8192" value="512"
                    style="width:5em"></label>
  <button id="toolsbtn" type="button">Tools</button>
  <button id="agentbtn" type="button">Agent</button>
  <button id="settingsbtn" type="button">Settings</button>
  <button id="filesbtn" type="button">Files</button>
  <span id="stats"></span>
</header>
<div id="main">
  <div id="log"></div>
  <aside id="tools">
    <h2>tool definitions (JSON array)</h2>
    <textarea id="tooldefs" class="json-box"
      placeholder='[{"type":"function","function":{"name":"get_weather",
"description":"...","parameters":{"type":"object","properties":{}}}}]'></textarea>
    <div id="toolstatus" style="font-size:12px;color:var(--dim)"></div>
  </aside>
  <aside id="agent">
    <h2>agent sessions</h2>
    <div id="sesslist"></div>
    <div id="sessview" hidden></div>
  </aside>
  <aside id="settings">
    <h2>settings</h2>
    <label>system prompt
      <textarea id="sysprompt" rows="4"></textarea></label>
    <label>top_p <input id="top_p" type="number" min="0" max="1"
                        step="0.05" value="1"></label>
    <label>top_k <input id="top_k" type="number" min="0" step="1"
                        value="0"></label>
    <label>presence penalty <input id="presence" type="number" min="-2"
                        max="2" step="0.1" value="0"></label>
    <label>frequency penalty <input id="frequency" type="number" min="-2"
                        max="2" step="0.1" value="0"></label>
  </aside>
  <aside id="files">
    <h2>/v1/files</h2>
    <div id="filelist"></div>
    <div id="fileview" hidden></div>
  </aside>
</div>
<footer>
  <div id="attach-preview"></div>
  <form id="f">
    <button id="attach" type="button"
            title="attach image">&#128206;</button>
    <input id="attach-input" type="file" accept="image/*" hidden>
    <textarea id="q" placeholder="Send a message… (Enter to send, Shift+Enter for newline)"></textarea>
    <button id="send" class="primary" type="submit">Send</button>
  </form>
</footer>
<script>
const log = document.getElementById('log');
const form = document.getElementById('f');
const q = document.getElementById('q');
const send = document.getElementById('send');
const stats = document.getElementById('stats');

// conversation model: messages[i] = {role, content, reasoning, toolCalls,
// images: [dataURI]}
// branches.get(i) = [suffix, ...] — alternative continuations from index i
// (message-branch editing, the reference webui's branch switcher)
let messages = [];
const branches = new Map();
let branchPos = new Map();   // i -> active branch index
let attachments = [];        // pending data URIs for the next message

// ---- model bar --------------------------------------------------------
async function refreshModels() {
  const d = await fetch('/v1/models').then(r => r.json()).catch(() => null);
  const sel = document.getElementById('model');
  sel.textContent = '';
  for (const m of (d && d.data) || []) sel.add(new Option(m.id, m.id));
  const info = document.getElementById('modelinfo');
  info.textContent = ((d && d.data) || []).length + ' loaded';
}
refreshModels();

// ---- sidebar toggling -------------------------------------------------
const panels = {tools: 'toolsbtn', agent: 'agentbtn',
                settings: 'settingsbtn', files: 'filesbtn'};
for (const [panel, btn] of Object.entries(panels)) {
  document.getElementById(btn).addEventListener('click', () => {
    for (const p of Object.keys(panels)) {
      const el = document.getElementById(p);
      const b = document.getElementById(panels[p]);
      if (p === panel) {
        el.classList.toggle('open');
        b.classList.toggle('active', el.classList.contains('open'));
        if (el.classList.contains('open')) {
          if (p === 'files') loadFiles();
          if (p === 'agent') loadSessions();
        }
      } else { el.classList.remove('open'); b.classList.remove('active'); }
    }
  });
}

// ---- tools panel ------------------------------------------------------
function currentTools() {
  const raw = document.getElementById('tooldefs').value.trim();
  const status = document.getElementById('toolstatus');
  if (!raw) { status.textContent = ''; return null; }
  try {
    const t = JSON.parse(raw);
    status.textContent = t.length + ' tool(s) active';
    return t;
  } catch (e) { status.textContent = 'invalid JSON: ' + e.message; return null; }
}
document.getElementById('tooldefs').addEventListener('input', currentTools);

// ---- agent sessions + approvals --------------------------------------
async function loadSessions() {
  const list = document.getElementById('sesslist');
  list.textContent = '';
  const d = await fetch('/v1/agent/sessions').then(r => r.json())
    .catch(() => null);
  for (const sid of (d && d.data) || []) {
    const row = document.createElement('div');
    row.className = 'sess-row';
    row.textContent = sid;
    const btn = document.createElement('button');
    btn.className = 'approve-btn';
    btn.textContent = 'approve';
    btn.title = 'approve pending agent actions for this session';
    btn.addEventListener('click', async ev => {
      ev.stopPropagation();
      const r = await fetch('/v1/agent/sessions/' + sid + '/approve',
                            {method: 'POST'});
      btn.textContent = r.ok ? 'approved ✓' : 'error';
    });
    row.append(btn);
    row.addEventListener('click', () => viewSession(sid));
    list.append(row);
  }
  if (!list.childElementCount) list.textContent = '(no sessions)';
}

async function viewSession(sid) {
  const view = document.getElementById('sessview');
  view.hidden = false;
  view.textContent = '';
  const d = await fetch('/v1/agent/sessions/' + sid).then(r => r.json())
    .catch(() => null);
  for (const m of (d && d.messages) || []) {
    const h = document.createElement('div');
    h.style.cssText = 'font-size:11px;color:var(--dim);margin-top:8px';
    h.textContent = m.role;
    view.append(h);
    // code-exec outputs (tool role) render as terminal panes
    const body = document.createElement(m.role === 'tool' ? 'pre' : 'div');
    if (m.role === 'tool') body.className = 'termpane';
    body.style.fontSize = '12px';
    body.textContent = typeof m.content === 'string'
      ? m.content : JSON.stringify(m.content, null, 1);
    view.append(body);
  }
}

// ---- files sidebar ---------------------------------------------------
async function loadFiles() {
  const list = document.getElementById('filelist');
  list.textContent = '';
  const d = await fetch('/v1/files').then(r => r.json()).catch(() => null);
  for (const f of (d && d.data) || []) {
    const row = document.createElement('div');
    row.className = 'file-row';
    row.textContent = (f.filename || f.id) + '  (' + (f.bytes ?? '?') + ' B)';
    row.addEventListener('click', async () => {
      const view = document.getElementById('fileview');
      view.hidden = false;
      view.textContent = await fetch('/v1/files/' + f.id + '/content')
        .then(r => r.text()).catch(e => 'error: ' + e);
    });
    list.append(row);
  }
  if (!list.childElementCount) list.textContent = '(no files)';
}

// ---- image attach -----------------------------------------------------
document.getElementById('attach').addEventListener('click', () =>
  document.getElementById('attach-input').click());
document.getElementById('attach-input').addEventListener('change', ev => {
  for (const file of ev.target.files) {
    const reader = new FileReader();
    reader.onload = () => {
      attachments.push(reader.result);
      const img = document.createElement('img');
      img.src = reader.result;
      img.title = 'click to remove';
      img.addEventListener('click', () => {
        attachments.splice(attachments.indexOf(reader.result), 1);
        img.remove();
      });
      document.getElementById('attach-preview').append(img);
    };
    reader.readAsDataURL(file);
  }
  ev.target.value = '';
});

// ---- rendering --------------------------------------------------------
function splitThink(text) {
  // pull <think>…</think> spans out of the accumulated stream
  let reasoning = '', content = '', rest = text;
  for (;;) {
    const a = rest.indexOf('<think>');
    if (a < 0) { content += rest; break; }
    content += rest.slice(0, a);
    const b = rest.indexOf('</think>', a);
    if (b < 0) { reasoning += rest.slice(a + 7); break; }
    reasoning += rest.slice(a + 7, b);
    rest = rest.slice(b + 8);
  }
  return [reasoning.trim(), content];
}

function render() {
  log.textContent = '';
  messages.forEach((m, i) => {
    const r = document.createElement('div');
    r.className = 'role';
    const name = document.createElement('span');
    name.textContent = m.role;
    r.append(name);
    const alts = branches.get(i);
    if (m.role === 'user' && alts && alts.length > 1) {
      const pos = branchPos.get(i) || 0;
      const prev = document.createElement('button');
      prev.textContent = '◀';
      prev.title = 'previous branch';
      prev.addEventListener('click', () => switchBranch(i, -1));
      const lab = document.createElement('span');
      lab.textContent = (pos + 1) + '/' + alts.length;
      const next = document.createElement('button');
      next.textContent = '▶';
      next.title = 'next branch';
      next.addEventListener('click', () => switchBranch(i, +1));
      r.append(prev, lab, next);
    }
    r.append(Object.assign(document.createElement('span'),
                           {className: 'spacer'}));
    if (m.role === 'user') {
      const edit = document.createElement('button');
      edit.textContent = '✎ edit';
      edit.addEventListener('click', () => editMessage(i));
      r.append(edit);
    }
    log.append(r);
    if (m.reasoning) {
      const d = document.createElement('details');
      d.className = 'think';
      const s = document.createElement('summary');
      s.textContent = 'reasoning';
      const pre = document.createElement('pre');
      pre.textContent = m.reasoning;
      d.append(s, pre);
      log.append(d);
    }
    const div = document.createElement('div');
    div.className = 'msg ' + m.role;
    div.textContent = m.content;
    div.dataset.index = i;
    for (const uri of m.images || []) {
      const img = document.createElement('img');
      img.className = 'attach';
      img.src = uri;
      div.append(img);
    }
    log.append(div);
    for (const tc of m.toolCalls || []) {
      const pane = document.createElement('div');
      pane.className = 'toolcall';
      pane.textContent = 'tool_call ' + (tc.function?.name || '?') + '(' +
        (tc.function?.arguments || '') + ')';
      log.append(pane);
    }
  });
  log.scrollTop = log.scrollHeight;
}

// ---- branches ---------------------------------------------------------
function saveBranch(i) {
  const alts = branches.get(i) || [];
  alts[branchPos.get(i) || 0] = messages.slice(i).map(m => ({...m}));
  branches.set(i, alts);
}

function switchBranch(i, dir) {
  saveBranch(i);
  const alts = branches.get(i);
  const pos = ((branchPos.get(i) || 0) + dir + alts.length) % alts.length;
  branchPos.set(i, pos);
  messages = messages.slice(0, i).concat(alts[pos].map(m => ({...m})));
  render();
}

function editMessage(i) {
  const div = log.querySelector('.msg[data-index="' + i + '"]');
  if (!div) return;
  const box = document.createElement('textarea');
  box.className = 'edit-box';
  box.value = messages[i].content;
  div.textContent = '';
  div.append(box);
  box.focus();
  box.addEventListener('keydown', ev => {
    if (ev.key === 'Enter' && !ev.shiftKey) {
      ev.preventDefault();
      // snapshot the current continuation as a branch, start a new one
      saveBranch(i);
      const alts = branches.get(i);
      branchPos.set(i, alts.length);
      alts.push([]);
      messages = messages.slice(0, i);
      messages.push({role: 'user', content: box.value.trim()});
      render();
      complete();
    } else if (ev.key === 'Escape') { render(); }
  });
}

q.addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); form.requestSubmit(); }
});

form.addEventListener('submit', e => {
  e.preventDefault();
  const text = q.value.trim();
  if (!text && !attachments.length) return;
  q.value = '';
  messages.push({role: 'user', content: text, images: attachments.slice()});
  attachments = [];
  document.getElementById('attach-preview').textContent = '';
  render();
  complete();
});

function wireMessage(m) {
  // API-shaped message: images become image_url content parts
  if (m.images && m.images.length) {
    const parts = [{type: 'text', text: m.content}];
    for (const uri of m.images)
      parts.push({type: 'image_url', image_url: {url: uri}});
    return {role: m.role, content: parts};
  }
  return {role: m.role, content: m.content};
}

// ---- streaming completion --------------------------------------------
async function complete() {
  send.disabled = true;
  const asst = {role: 'assistant', content: '', reasoning: '', toolCalls: []};
  messages.push(asst);
  render();
  const t0 = performance.now();
  let ntok = 0, acc = '';
  const sys = document.getElementById('sysprompt').value.trim();
  const wire = messages.slice(0, -1).map(wireMessage);
  if (sys) wire.unshift({role: 'system', content: sys});
  const body = {
    model: document.getElementById('model').value || 'default',
    messages: wire,
    temperature: parseFloat(document.getElementById('temp').value),
    top_p: parseFloat(document.getElementById('top_p').value),
    max_tokens: parseInt(document.getElementById('maxtok').value),
    presence_penalty: parseFloat(document.getElementById('presence').value),
    frequency_penalty: parseFloat(document.getElementById('frequency').value),
    stream: true,
  };
  const tk = parseInt(document.getElementById('top_k').value);
  if (tk > 0) body.top_k = tk;
  const tools = currentTools();
  if (tools) body.tools = tools;
  try {
    const resp = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body),
    });
    if (!resp.ok) { asst.content = 'error: ' + await resp.text(); render(); return; }
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let idx;
      while ((idx = buf.indexOf('\\n\\n')) >= 0) {
        const chunk = buf.slice(0, idx); buf = buf.slice(idx + 2);
        for (const line of chunk.split('\\n')) {
          if (!line.startsWith('data:')) continue;
          const data = line.slice(5).trim();
          if (data === '[DONE]') continue;
          const delta = JSON.parse(data).choices?.[0]?.delta || {};
          if (delta.reasoning_content) asst.reasoning += delta.reasoning_content;
          if (delta.content) { acc += delta.content; ntok++; }
          for (const tc of delta.tool_calls || []) {
            const cur = asst.toolCalls[tc.index] ||
              (asst.toolCalls[tc.index] =
                {function: {name: '', arguments: ''}});
            if (tc.function?.name) cur.function.name += tc.function.name;
            if (tc.function?.arguments)
              cur.function.arguments += tc.function.arguments;
          }
        }
      }
      const [think, content] = splitThink(acc);
      asst.reasoning = asst.reasoning || think;
      if (think) asst.reasoning = think;
      asst.content = content;
      render();
      const dt = (performance.now() - t0) / 1000;
      stats.textContent = ntok + ' chunks · ' + (ntok / dt).toFixed(1) + '/s';
    }
  } catch (err) {
    asst.content = 'error: ' + err;
    render();
  } finally {
    send.disabled = false; q.focus();
  }
}
</script>
</body>
</html>
"""
